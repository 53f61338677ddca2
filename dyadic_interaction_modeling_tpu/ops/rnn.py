"""LSTM / BiLSTM as ``lax.scan`` (L2).

Parity target: the 2-layer bidirectional ``nn.LSTM`` heads in
``EmocaConverter`` / ``SpeakerSLMFT``
(``/root/reference/code/seq2seq_pretrain.py:801-814``) and the
``SimpleLSTM`` baseline (``seq2seq.py:292-309``).

Parameterisation matches torch exactly (W_ih (4H, In), W_hh (4H, H), two bias
vectors, gate order i,f,g,o) so reference checkpoints map 1:1. The recurrence
is a ``lax.scan`` over time; each step's gate computation is one fused matmul
on the MXU.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def lstm_scan(x: Array, w_ih: Array, w_hh: Array, b_ih: Array, b_hh: Array,
              reverse: bool = False) -> Array:
    """Run one LSTM direction over (B, L, In) -> (B, L, H)."""
    hdim = w_hh.shape[1]
    b, l, _ = x.shape
    # hoist the input projection out of the scan: one big MXU matmul
    gates_x = jnp.einsum("bli,gi->blg", x, w_ih,
                         preferred_element_type=jnp.float32) + b_ih + b_hh

    def step(carry, gx_t):
        h, c = carry
        gates = gx_t + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, hdim), dtype=x.dtype), jnp.zeros((b, hdim), dtype=x.dtype))
    gates_t = jnp.swapaxes(gates_x, 0, 1).astype(x.dtype)  # (L, B, 4H)
    _, hs = jax.lax.scan(step, init, gates_t, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


class LSTM(nn.Module):
    """Multi-layer (bi)directional LSTM with torch-compatible parameters."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for layer in range(self.num_layers):
            in_dim = h.shape[-1]
            outs = []
            for direction in range(2 if self.bidirectional else 1):
                sfx = f"_l{layer}" + ("_reverse" if direction == 1 else "")
                w_ih = self.param(f"weight_ih{sfx}", nn.initializers.lecun_normal(),
                                  (4 * self.hidden_size, in_dim))
                w_hh = self.param(f"weight_hh{sfx}", nn.initializers.orthogonal(),
                                  (4 * self.hidden_size, self.hidden_size))
                b_ih = self.param(f"bias_ih{sfx}", nn.initializers.zeros,
                                  (4 * self.hidden_size,))
                b_hh = self.param(f"bias_hh{sfx}", nn.initializers.zeros,
                                  (4 * self.hidden_size,))
                outs.append(lstm_scan(h, w_ih.astype(self.dtype), w_hh.astype(self.dtype),
                                      b_ih.astype(self.dtype), b_hh.astype(self.dtype),
                                      reverse=direction == 1))
            h = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        return h
