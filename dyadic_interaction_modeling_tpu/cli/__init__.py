"""CLI entry points (L4) mirroring the reference scripts:

train_vq, train_s2s_pretrain, finetune_s2s_pretrain, test_s2s_pretrain,
train_s2s, test_s2s, train_converter, test_biwi, test_l2l.

Run as ``python -m dyadic_interaction_modeling_tpu.cli.train_vq --config
config.yaml [KEY VALUE ...]``. Every entry supports ``--synthetic`` to run
the identical code path on generated data (smoke/e2e testing without the
licensed datasets).
"""
