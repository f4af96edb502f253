"""Scaling-efficiency measurement (SURVEY.md §2.4, north-star >=90%).

The sharded render (parallel/sharding.py) replicates the scene and gives
each device its own pixel-row block; the hot loop has ZERO collectives
(only the optional spp-axis psum-mean, one per pass). Scaling efficiency
on a real slice is therefore governed by exactly two terms, both
measurable on the hardware we have:

  mode `cpu N`  — program overhead. On an N-virtual-device CPU mesh
    (this box has 2 cores, so no speedup is possible or claimed) run the
    SAME total work sharded N ways vs unsharded, and verify the sharded
    image equals the unsharded one. The ratio isolates what sharding
    itself adds: shard_map plumbing, the per-device row offset math, and
    the spp psum. Run one N per process (XLA device count is fixed at
    backend init): `python exp/scaling_probe.py cpu 8`.

  mode `tpu`    — load balance. On the one real chip, time each of the 8
    row blocks of the bench frame (1024x512, loong-100k, 8 bounces)
    separately with `_trace_rows` — the exact per-device unit of
    `_sharded_pass_impl`. An N-chip render's pass time is the max over
    its chips' block groups, so efficiency(N) = mean / max(group sums).
    This is an extrapolation, but a hardware-grounded one: it measures
    the only term (content-dependent ray cost imbalance) that the
    zero-collective design leaves.

Results are archived in exp/RESULTS.md and the README scaling table.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cpu(n):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
    from opengl_ray_tracing_framework_tpu.parallel.sharding import (
        make_mesh, render_pass_sharded, replicate_scene)
    from opengl_ray_tracing_framework_tpu.render import (
        init_render_state, render_pass)

    assert len(jax.devices()) >= n, jax.devices()
    _, scene = build_test_scene(n_sphere_subdiv=3)
    cfg = RenderConfig(width=256, height=256, max_bounce=4)
    cam = Camera.make(position=(0.0, 0.5, -2.0), yaw=90.0, pitch=-8.0,
                      zoom=30.0, aspect=1.0)

    def timed(fn, *args):
        st = fn(*args)                                   # compile + warm
        jax.block_until_ready(st.accum)
        t0 = time.time()
        st = fn(*args)
        jax.block_until_ready(st.accum)
        return st, time.time() - t0

    base_st, base_s = timed(
        lambda: render_pass(scene, cam, init_render_state(cfg), cfg,
                            rays_per_tile=16384))

    mesh = make_mesh(jax.devices()[:n])
    sh_scene = replicate_scene(scene, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P
    st0 = jax.device_put(
        init_render_state(cfg),
        type(init_render_state(cfg))(
            accum=NamedSharding(mesh, P("tiles", None, None)),
            n_samples=NamedSharding(mesh, P())))
    sh_st, sh_s = timed(
        lambda: render_pass_sharded(sh_scene, cam, st0, cfg, mesh,
                                    rays_per_tile=16384))

    eq = bool(np.allclose(np.asarray(sh_st.accum), np.asarray(base_st.accum),
                          atol=1e-5, rtol=1e-5))
    print(json.dumps({
        "mode": "cpu", "devices": n, "unsharded_s": round(base_s, 3),
        "sharded_s": round(sh_s, 3),
        "overhead": round(sh_s / base_s - 1.0, 4), "equal": eq}))


def run_tpu():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.models.scene import (
        build_reference_scene)
    from opengl_ray_tracing_framework_tpu.parallel.sharding import _trace_rows

    _, scene = build_reference_scene(objects=("floor", "loong"))
    w, h, blocks = 1024, 512, 8
    rows = h // blocks
    cfg = RenderConfig(width=w, height=h, max_bounce=8, use_pallas=True,
                       pallas_backend="sweep")
    cam = Camera.make(aspect=w / h)

    block = jax.jit(
        lambda row0: _trace_rows(scene, cam, jnp.uint32(1), cfg, row0,
                                 rows, 131072),
        static_argnames=())

    times = []
    for b in range(blocks):
        row0 = jnp.int32(b * rows)
        jax.block_until_ready(block(row0))               # compile + warm
        t0 = time.time()
        jax.block_until_ready(block(row0))
        times.append(time.time() - t0)
    times = np.asarray(times)

    effs = {}
    for ndev in (2, 4, 8):
        groups = times.reshape(ndev, blocks // ndev).sum(axis=1)
        effs[ndev] = float(groups.mean() / groups.max())
    print(json.dumps({
        "mode": "tpu", "block_seconds": [round(t, 3) for t in times],
        "efficiency": {str(k): round(v, 4) for k, v in effs.items()}}))


if __name__ == "__main__":
    if sys.argv[1] == "cpu":
        run_cpu(int(sys.argv[2]))
    else:
        run_tpu()
