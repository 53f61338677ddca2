import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.ops.rnn import LSTM


def test_bilstm_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    ref = torch.nn.LSTM(input_size=12, hidden_size=16, num_layers=2,
                        batch_first=True, bidirectional=True).eval()
    x = torch.randn(3, 9, 12)
    with torch.no_grad():
        ref_out, _ = ref(x)

    model = LSTM(hidden_size=16, num_layers=2, bidirectional=True)
    params = {"params": {k: jnp.asarray(v.detach().numpy())
                         for k, v in ref.state_dict().items()}}
    out = model.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-5)


def test_unidirectional_lstm_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    ref = torch.nn.LSTM(input_size=8, hidden_size=6, num_layers=1,
                        batch_first=True).eval()
    x = torch.randn(2, 7, 8)
    with torch.no_grad():
        ref_out, _ = ref(x)
    model = LSTM(hidden_size=6, num_layers=1)
    params = {"params": {k: jnp.asarray(v.detach().numpy())
                         for k, v in ref.state_dict().items()}}
    out = model.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-5)
