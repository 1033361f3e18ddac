"""Dataset registry — parity: /root/reference/datasets/__init__.py:5-8."""

from __future__ import annotations

import importlib


def find_dataset_def(name: str):
    """Returns the MVSDataset class from diffmvs_tpu.data.<name>."""
    module = importlib.import_module(f"diffmvs_tpu.data.{name}")
    return module.MVSDataset
