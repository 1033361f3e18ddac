"""CLI entry points: python -m diffmvs_tpu.cli.train / .test / .fuse."""
