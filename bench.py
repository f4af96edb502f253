"""Headline benchmark: rays/sec on the loong-100k scene (BASELINE.md).

Renders the reference's default scene (floor + loong_100000, tear-glass
material, HDR environment, 8 bounces, 1024x512 — Scene.h:111-162,
RenderSettings.h:8-12) and reports traced rays per second for one
progressive pass. Ray accounting is fixed by definition so rounds are
comparable: each pixel sample launches 1 primary ray plus, per bounce,
1 NEE shadow ray and 1 bounce ray => rays = W * H * spp * (1 + 2 * bounces),
the same rays the reference megakernel issues per frame.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is the ratio against the newest recorded BENCH_r*.json (1.0 if
none exists — the reference publishes no numbers, BASELINE.md).
"""

import glob
import json
import os
import re
import sys
import time


def main():
    import jax

    from opengl_ray_tracing_framework_tpu import RenderConfig
    from opengl_ray_tracing_framework_tpu.models.camera import Camera
    from opengl_ray_tracing_framework_tpu.models.scene import (
        build_reference_scene,
        build_test_scene,
    )
    from opengl_ray_tracing_framework_tpu.render import (
        init_render_state,
        render_pass,
    )

    width, height, bounces = 1024, 512, 8
    spp_per_pass = int(os.environ.get("BENCH_SPP", "1"))
    rays_per_tile = int(os.environ.get("BENCH_TILE", "131072"))

    try:
        _, scene = build_reference_scene(objects=("floor", "loong"))
        scene_name = "loong-100k"
    except Exception as e:  # assets unavailable: procedural fallback
        print(f"# loong assets unavailable ({e}); procedural fallback",
              file=sys.stderr)
        _, scene = build_test_scene(n_sphere_subdiv=4)
        scene_name = "procedural"

    camera = Camera.make(aspect=width / height)
    # use_pallas: the scheduled-wavefront tracer — the TPU fast path
    # (ops/schedule.py); parity vs the while-loop oracle is enforced by
    # tests/test_tpu.py on hardware.
    config = RenderConfig(width=width, height=height, max_bounce=bounces,
                          spp_per_pass=spp_per_pass, use_pallas=True)

    state = init_render_state(config)
    # warmup / compile
    t0 = time.time()
    state = render_pass(scene, camera, state, config,
                        rays_per_tile=rays_per_tile)
    jax.block_until_ready(state.accum)
    compile_s = time.time() - t0

    n_timed = int(os.environ.get("BENCH_PASSES", "3"))
    t0 = time.time()
    for _ in range(n_timed):
        state = render_pass(scene, camera, state, config,
                            rays_per_tile=rays_per_tile)
    jax.block_until_ready(state.accum)
    elapsed = (time.time() - t0) / n_timed

    rays = width * height * spp_per_pass * (1 + 2 * bounces)
    rays_per_sec = rays / elapsed

    baseline = None
    recs = []
    for path in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json", path)
        if m:
            try:
                with open(path) as fh:
                    recs.append((int(m.group(1)), json.load(fh)))
            except Exception:
                pass
    if recs:
        recs.sort()
        prev = recs[-1][1]
        if isinstance(prev, dict) and prev.get("value"):
            baseline = float(prev["value"])

    out = {
        "metric": f"rays/sec/chip fwd ({scene_name}, {width}x{height}, "
                  f"{bounces} bounces)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4) if baseline else 1.0,
        "pass_seconds": round(elapsed, 4),
        "compile_seconds": round(compile_s, 2),
        "device": str(jax.devices()[0]),
        "n_triangles": scene.n_triangles,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
