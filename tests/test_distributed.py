"""Real multi-process jax.distributed execution (VERDICT r4 weak #5:
parallel/distributed.py's coordinator branch had never run). Launches
2 local processes x 4 virtual CPU devices each, exercises
``dist.initialize(num_processes=2, ...)`` -> ``global_mesh()`` ->
``train_step_sharded`` on the 2x4 ("hosts", "chips") mesh, and asserts
the result matches this process's single-process 8-device run (the
seeds are per global pixel id, so the distributed step is equal by
construction up to psum addition order)."""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(900)
def test_two_process_distributed_train_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "distributed_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # the axon sitecustomize pins JAX_PLATFORMS; the worker overrides
    # via jax.config before first device use (tests/conftest.py gotcha)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(rank), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for rank in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        m = re.search(r"DIST_RESULT rank=(\d+) loss=(\S+) em=(.+)", out)
        assert m, f"no result line in:\n{out[-4000:]}"
        results[int(m.group(1))] = (
            float(m.group(2)),
            np.array([float(x) for x in m.group(3).split()]))

    # both processes see the same reduced result
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)

    # single-process 8-device reference (this process has 8 virtual
    # devices via conftest)
    import jax.numpy as jnp
    import optax

    import mitsuba3_tpu as mi
    from mitsuba3_tpu.parallel import make_mesh, train_step_sharded

    d = mi.cornell_box(width=16, height=16, max_depth=2)
    d["integrator"] = {"type": "prb", "max_depth": 2}
    scene = mi.load_dict(d)

    def params_fn(s, p):
        if p is None:
            return {"em_radiance": s.em_radiance}
        return s.replace(em_radiance=p["em_radiance"])

    optimizer = optax.adam(1e-2)
    params = params_fn(scene, None)
    opt_state = optimizer.init(params)
    new_params, _, loss = train_step_sharded(
        scene, make_mesh(8), jnp.zeros((16, 16, 3), jnp.float32),
        opt_state, optimizer, params_fn, seed=7, spp=1)

    assert results[0][0] == pytest.approx(float(loss), rel=1e-5)
    np.testing.assert_allclose(
        results[0][1],
        np.asarray(new_params["em_radiance"]).reshape(-1),
        rtol=1e-4, atol=1e-7)
