"""Weak-scaling efficiency on the virtual CPU mesh: per-device work held
CONSTANT (64 image rows x 256 width per device), devices 1 -> 8.

Ideal weak scaling keeps wall time constant as devices are added
(efficiency = T1/TN = 1). On real multi-chip hardware each virtual device
would be a chip; on this 2-core CPU box the N>=4 rows necessarily measure
core contention as well — the table is committed for its *shape*
(methodology + the zero-collective design's only loss terms) with the
honest caveat, and the 1->2 row is the only contention-free data point.

Run: JAX_PLATFORMS=cpu python exp/weak_scaling.py
(re-execs itself with the right XLA_FLAGS for each N)
"""
import json
import os
import subprocess
import sys
import time

ROWS_PER_DEV = 64
WIDTH = 256
BOUNCES = 4
SPP = 2


def worker(n):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.models.scene import build_test_scene
    from opengl_ray_tracing_framework_tpu.parallel.sharding import (
        make_mesh, render_pass_sharded, replicate_scene)
    from opengl_ray_tracing_framework_tpu.render import init_render_state

    devices = jax.devices()[:n]
    assert len(devices) == n
    mesh = make_mesh(devices)
    height = ROWS_PER_DEV * n
    config = RenderConfig(width=WIDTH, height=height, max_bounce=BOUNCES,
                          spp_per_pass=SPP)
    _, scene = build_test_scene(n_sphere_subdiv=2)
    scene = replicate_scene(scene, mesh)
    camera = Camera.make(position=(0.0, 0.5, -2.0), yaw=90.0, pitch=-8.0,
                         zoom=30.0, aspect=WIDTH / height)
    state = init_render_state(config)
    state = jax.device_put(
        state, type(state)(accum=NamedSharding(mesh, P("tiles", None, None)),
                           n_samples=NamedSharding(mesh, P())))
    # compile + warm
    state = render_pass_sharded(scene, camera, state, config, mesh,
                                rays_per_tile=ROWS_PER_DEV * WIDTH)
    jax.block_until_ready(state.accum)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        state = render_pass_sharded(scene, camera, state, config, mesh,
                                    rays_per_tile=ROWS_PER_DEV * WIDTH)
        jax.block_until_ready(state.accum)
    dt = (time.time() - t0) / reps
    rays = WIDTH * height * SPP * (1 + 2 * BOUNCES)
    print(json.dumps({"n": n, "seconds": dt, "rays": rays,
                      "rays_per_sec": rays / dt}))


def main():
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}"
                            ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"N={n} FAILED:\n{out.stdout}\n{out.stderr[-2000:]}")
            sys.exit(1)
        rec = json.loads(line[-1])
        results.append(rec)
        print(f"N={rec['n']}: {rec['seconds']:.2f} s/pass "
              f"({rec['rays_per_sec']:,.0f} rays/s total)")
    t1 = results[0]["seconds"]
    print("\n| devices | s/pass (work x N) | weak-scaling efficiency T1/TN |")
    print("|---|---|---|")
    for r in results:
        print(f"| {r['n']} | {r['seconds']:.2f} | {t1 / r['seconds']:.2f} |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
