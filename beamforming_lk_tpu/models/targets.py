"""Shared target-list utilities (reference: Target struct, worker.h:32-61)."""

from __future__ import annotations

import numpy as np


def targets_to_list(targets):
    """Targets pytree -> list of dicts for host-side consumers (UI, fusion,
    MQTT adapters)."""
    valid = np.asarray(targets.valid)
    out = []
    for i in np.where(valid)[0]:
        out.append(
            {
                "theta": float(np.asarray(targets.theta)[i]),
                "phi": float(np.asarray(targets.phi)[i]),
                "power": float(np.asarray(targets.power)[i]),
                "probability": float(np.asarray(targets.probability)[i]),
                "start": float(np.asarray(targets.start)[i]),
            }
        )
    return out
