import os
import textwrap

import pytest

from dyadic_interaction_modeling_tpu import config as C


def test_flatten_and_attr_access(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent("""
        NETWORK:
          in_dim: 56
          hidden_size: 384
        TRAIN:
          base_lr: 0.0001
          subjects: F2 F3
    """))
    cfg = C.load_cfg_from_cfg_file(str(p))
    assert cfg.in_dim == 56
    assert cfg.hidden_size == 384
    assert cfg.base_lr == pytest.approx(1e-4)
    assert cfg.subjects == "F2 F3"


def test_merge_cli_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("A:\n  x: 1\n  y: [1, 2]\n  name: foo\n")
    cfg = C.load_cfg_from_cfg_file(str(p))
    new = C.merge_cfg_from_list(cfg, ["x", "5", "y", "(3, 4)", "name", "bar"])
    assert new.x == 5
    assert new.y == [3, 4]  # tuple coerced to list
    assert new.name == "bar"
    assert cfg.x == 1  # original untouched


def test_merge_rejects_unknown_key(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("A:\n  x: 1\n")
    cfg = C.load_cfg_from_cfg_file(str(p))
    with pytest.raises(KeyError):
        C.merge_cfg_from_list(cfg, ["nope", "1"])


def test_reference_config_loads_identically():
    """Load the reference's shipped config.yaml and check key flattening."""
    ref = "/root/reference/code/config.yaml"
    if not os.path.isfile(ref):
        pytest.skip("reference not mounted")
    cfg = C.load_cfg_from_cfg_file(ref)
    assert cfg.arch == "stage1_BIWI"
    assert cfg.in_dim == 56
    assert cfg.n_embed == 512
    assert cfg.zquant_dim == 128
    assert cfg.face_quan_num == 1
    assert cfg.quant_factor == 0


def test_default_bundles():
    l = C.vq_listener_defaults()
    s = C.vq_speaker_defaults()
    assert l.in_dim == 56 and l.face_quan_num == 1 and l.hidden_size == 384
    assert s.in_dim == 824 and s.face_quan_num == 8 and s.hidden_size == 768
    slm = C.slm_defaults()
    assert slm.dim == 384 and slm.num_tokens == 512 and slm.enc_max_seq_len == 2048
