"""Worker for the 2-process jax.distributed localhost test.

Run (by tests/test_multiprocess.py) as:
    python tests/multiproc_worker.py <coordinator> <num_procs> <proc_id> <outdir>

Each process owns 4 virtual CPU devices; the 2-process job federates them
into a global 8-device ('tiles', 'samples') mesh.  Every process renders
its shards of the sharded accumulation, then writes ONLY the pixel rows it
owns (local_tile_slice) to <outdir>/part<proc_id>.npy; the parent stitches
and compares against a single-process render.  This exercises
initialize_cluster + the multi-controller SPMD path of
render_accum_sharded end-to-end (SURVEY.md S4 item 4, second half).
"""

import os
import sys


def main():
    coordinator, num_procs, proc_id, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    # "render" (default): full render + grad step (the original harness).
    # "crash":  render HALF the spp, save a sharded snapshot, then DIE
    #           (os._exit) before finishing — the failure being recovered.
    # "resume": restore the sharded snapshot, render the remaining spp,
    #           write final parts.  crash+resume must equal one full run.
    mode = sys.argv[5] if len(sys.argv) > 5 else "render"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from simplepathtracer_tpu.parallel import initialize_cluster

    initialize_cluster(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs, jax.devices()

    import numpy as np

    import simplepathtracer_tpu as spt
    from simplepathtracer_tpu.parallel import (
        local_tile_slice,
        make_mesh,
        render_accum_sharded,
    )

    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    cfg = spt.RenderConfig(width=32, height=16, spp=8, max_depth=4)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(tiles=4, samples=2)  # tile shards span both hosts
    snap_prefix = os.path.join(outdir, "shard_snap")

    if mode in ("fit", "fit_crash", "fit_resume"):
        # Distributed-training dress rehearsal: a multi-host Adam fit with
        # sharded loss/grad every step, train-state checkpointing by
        # process 0, and (crash/resume) a mid-fit host failure.  The
        # optimizer state is replicated, step keys are fold_in(key, i)
        # independent of history, and snapshots restore (params, Adam
        # state, step) exactly — so crash+resume must be BIT-identical to
        # the uninterrupted 2-process fit (the parent asserts it).
        import jax.numpy as jnp

        from simplepathtracer_tpu import inverse
        from simplepathtracer_tpu.render import render_sample_batch

        fcfg = spt.RenderConfig(width=24, height=12, spp=4, max_depth=3)
        # Target: plain local render of the truth — identical on every
        # process (all randomness keyed by global (pixel, sample) ids).
        tkey = jax.random.fold_in(key, 999)
        target = (
            render_sample_batch(scene, cam, fcfg, tkey, 0, fcfg.spp)
            / fcfg.spp
        ).reshape(fcfg.height, fcfg.width, 3)
        perturbed = scene.replace(
            albedo=jnp.clip(scene.albedo + 0.2, 0.05, 0.95)
        )
        snap = os.path.join(outdir, "fit_snap.npz")
        steps = 3 if mode == "fit_crash" else 6
        fitted, losses = inverse.fit_sharded(
            perturbed, target, cam, fcfg, key, mesh,
            steps=steps, lr=5e-2, leaves=("albedo",),
            snapshot_path=snap if mode != "fit" else None,
            snapshot_every=3 if mode != "fit" else 0,
        )
        if mode == "fit_crash":
            # Snapshot landed at step 3; die as if step 4 never ran.
            assert os.path.exists(snap), "process-0 snapshot missing"
            print(f"proc {proc_id}: fit crashed after 3 steps", flush=True)
            os._exit(17)
        np.savez(
            os.path.join(outdir, f"fit{proc_id}.npz"),
            albedo=np.asarray(fitted.albedo),
            losses=np.asarray(losses, np.float64),
        )
        print(f"proc {proc_id}: {mode} done ({len(losses)} losses)", flush=True)
        return

    if mode == "crash":
        from simplepathtracer_tpu import checkpoint

        half = cfg.spp // 2
        acc = jax.jit(
            lambda s, c, k: render_accum_sharded(s, c, cfg, k, mesh, 0, half),
        )(scene, cam, key)
        checkpoint.save_sharded(snap_prefix, acc, half, key, scene, cfg, mesh, cam)
        # File barrier: when the first process dies, the coordination
        # service tears down the peer — make sure BOTH snapshots exist
        # before either crash (a real fleet snapshots on a schedule, so
        # all hosts have one from the same step).
        import time

        open(os.path.join(outdir, f"snapped{proc_id}"), "w").close()
        deadline = time.time() + 60
        while not all(
            os.path.exists(os.path.join(outdir, f"snapped{i}"))
            for i in range(num_procs)
        ):
            if time.time() > deadline:
                os._exit(3)
            time.sleep(0.05)
        print(f"proc {proc_id}: snapshot at {half} spp, crashing now", flush=True)
        os._exit(17)  # simulate a mid-render host failure

    if mode == "resume":
        from simplepathtracer_tpu import checkpoint

        acc0, done, key_r, scene_r, cfg_r, cam_r = checkpoint.load_sharded(
            snap_prefix, mesh
        )
        acc = acc0 + jax.jit(
            lambda s, c, k: render_accum_sharded(
                s, c, cfg_r, k, mesh, done, cfg_r.spp - done
            ),
        )(scene_r, cam_r, key_r)
        cfg = cfg_r
    else:
        acc = jax.jit(
            lambda s, c, k: render_accum_sharded(s, c, cfg, k, mesh),
        )(scene, cam, key)

    start, size = local_tile_slice(mesh, cfg.num_pixels)
    # Collect this process's addressable rows of the tile-sharded output.
    local = np.zeros((size, 3), np.float32)
    seen = np.zeros((size,), bool)
    for shard in acc.addressable_shards:
        (sl, _) = shard.index
        lo = sl.start or 0
        local[lo - start : lo - start + shard.data.shape[0]] = np.asarray(shard.data)
        seen[lo - start : lo - start + shard.data.shape[0]] = True
    assert seen.all(), "local tile slice does not cover all addressable shards"
    np.save(os.path.join(outdir, f"part{proc_id}.npy"), local)
    np.save(os.path.join(outdir, f"range{proc_id}.npy"), np.array([start, size]))

    if mode == "resume":
        print(f"proc {proc_id}: resumed rows [{start}, {start+size}) ok", flush=True)
        return

    # One sharded gradient step across both processes: loss and grads are
    # replicated outputs (psum over both mesh axes), so every process holds
    # the full values — the parent compares them against a single-process
    # run.  This is the distributed form of the fwd+bwd north-star metric.
    import jax.numpy as jnp

    from simplepathtracer_tpu.parallel.sharding import loss_and_grad_sharded

    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    loss, grads = jax.jit(
        lambda s, t, c, k: loss_and_grad_sharded(s, t, c, cfg, k, mesh)
    )(scene, target, cam, key)
    np.savez(
        os.path.join(outdir, f"grads{proc_id}.npz"),
        loss=np.asarray(loss),
        **{k: np.asarray(v) for k, v in grads.items()},
    )
    print(f"proc {proc_id}: rows [{start}, {start+size}) + grad step ok", flush=True)


if __name__ == "__main__":
    main()
