"""Checkpoint / resume of progressive render state.

The reference restarts accumulation from zero on any perturbation and can
only persist a tone-mapped PNG (Utility.h:19-30); here the full progressive
state (running-mean accumulator + sample count) round-trips through one
npz file, so long converging renders survive restarts (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_render_state(path: str, state) -> None:
    np.savez_compressed(path, accum=np.asarray(state.accum),
                        n_samples=np.asarray(state.n_samples))


def load_render_state(path: str):
    from ..render import RenderState
    with np.load(path) as z:
        return RenderState(accum=jnp.asarray(z["accum"]),
                           n_samples=jnp.asarray(z["n_samples"]))
