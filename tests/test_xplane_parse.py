"""tools/xplane_parse.py — wire-format xplane reader used by the profiler
tool when the tensorboard plugin converter is broken (this image)."""
import glob
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_parses_cpu_trace_op_events(tmp_path):
    from tools.xplane_parse import op_totals, parse_planes

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((128, 128))
    f(x).block_until_ready()
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(3):
            f(x).block_until_ready()

    paths = glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
    assert paths, "trace produced no xplane files"
    planes = parse_planes(open(paths[0], "rb").read())
    names = [p["name"] for p in planes]
    assert any("CPU" in n or "host" in n for n in names)

    rows = op_totals(paths, plane_filter="", line_filter="")
    assert rows and all(r["total_ms"] >= 0 for r in rows)
    ops = {r["op"] for r in rows}
    # the jitted matmul must appear as a timed device-side event
    assert any("dot" in op for op in ops), sorted(ops)[:20]
