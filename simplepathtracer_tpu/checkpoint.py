"""Snapshot / resume for progressive renders.

The reference persists nothing mid-render — a crash loses the whole image
and the final BMP is its only artifact (include/IOHelpers.hpp:24-27;
SURVEY.md S5 "checkpoint/resume": none).  Here the checkpointable unit is
the ``RenderState`` pytree (accum image, sample count, RNG key): because
sample ids are global counters (ops/sampling.py), resuming from a snapshot
and continuing produces the bit-identical image of an uninterrupted run —
asserted by tests/test_checkpoint.py.

Format: a single ``np.savez`` archive (no orbax dependency needed for three
arrays; swap in ``orbax.checkpoint`` for multi-host sharded state if renders
ever outgrow one host's memory).
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from .types import Camera, RenderConfig, RenderState, Scene

_FORMAT_VERSION = 3

_SCENE_FIELDS = (
    "centers", "radii", "albedo", "material", "fuzz", "ior", "sky_lo", "sky_hi"
)
_CAMERA_FIELDS = ("origin", "lookat", "vup", "vfov_deg", "aperture", "focus_dist")


def save(
    path: str, state: RenderState, scene: Scene, config: RenderConfig,
    camera: Camera | None = None,
) -> str:
    """Atomically write a snapshot (temp file + rename)."""
    payload = {
        "version": np.int64(_FORMAT_VERSION),
        "accum": np.asarray(state.accum, np.float32),
        "sample_count": np.asarray(state.sample_count, np.int64),
        "next_key": np.asarray(state.next_key),
        # The FULL config dataclass (v3+): earlier versions hand-listed the
        # fields and silently dropped rr_start_depth / use_pallas_hits /
        # silhouette_softness, so resuming an RR render continued without RR
        # — breaking bit-identical resume exactly for the headline RR config.
        "config_json": np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), np.uint8
        ),
    }
    for f in _SCENE_FIELDS:
        payload[f"scene_{f}"] = np.asarray(getattr(scene, f))
    if camera is not None:
        for f in _CAMERA_FIELDS:
            payload[f"camera_{f}"] = np.asarray(getattr(camera, f))
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def load(path: str):
    """Read a snapshot -> (RenderState, Scene, RenderConfig, Camera | None).

    The camera is None for snapshots written without one (format v1)."""
    with np.load(path) as z:
        version = int(z["version"])
        assert 1 <= version <= _FORMAT_VERSION, f"unknown snapshot version {version}"
        cfg = json.loads(bytes(z["config_json"].tobytes()).decode())
        # Forward/backward compatible: ignore fields RenderConfig no longer
        # has; fields a v1/v2 snapshot lacks take their defaults.
        known = {f.name for f in dataclasses.fields(RenderConfig)}
        config = RenderConfig(**{k: v for k, v in cfg.items() if k in known})
        state = RenderState(
            accum=jnp.asarray(z["accum"]),
            sample_count=jnp.asarray(z["sample_count"], jnp.int32),
            next_key=jnp.asarray(z["next_key"]),
        )
        scene = Scene(**{f: jnp.asarray(z[f"scene_{f}"]) for f in _SCENE_FIELDS})
        camera = None
        if f"camera_{_CAMERA_FIELDS[0]}" in z:
            camera = Camera(
                **{f: jnp.asarray(z[f"camera_{f}"]) for f in _CAMERA_FIELDS}
            )
    return state, scene, config, camera
