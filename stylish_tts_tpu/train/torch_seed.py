"""Warm-start a TrainState from a reference (torch) checkpoint.

Backs `stylish-train-tpu train --init-torch`: every model in the
accelerator save_state dir with a registered converter
(models/torch_convert.py) replaces its randomly-initialised params (and
batch-stats collections: aligner BatchNorm, mel-style-encoder spectral
norm); optimizers, LR schedules and CTC priors start fresh.
"""

from __future__ import annotations

import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def seed_state_from_torch(state, checkpoint_dir: str | Path):
    """Return ``state`` with params/batch_stats imported from the torch
    reference checkpoint at ``checkpoint_dir`` (models without a
    converter or not present in the state are left untouched)."""
    from ..export.import_torch import load_reference_state_dicts
    from ..models.torch_convert import CONVERTERS, convert_module
    from .checkpoint import fill_from_flat

    state_dicts = load_reference_state_dicts(checkpoint_dir)
    params = dict(state.params)
    batch_stats = dict(state.batch_stats)
    for name, sd in state_dicts.items():
        if name not in CONVERTERS or name not in params:
            logger.info("init-torch: skipping %s (no converter)", name)
            continue
        flat_params, flat_stats = convert_module(name, sd)
        params[name] = fill_from_flat(flat_params, params[name])
        if flat_stats:
            batch_stats[name] = fill_from_flat(flat_stats, batch_stats[name])
        logger.info("init-torch: imported %s", name)
    return state.replace(params=params, batch_stats=batch_stats)
