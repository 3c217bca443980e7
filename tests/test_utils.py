"""Utility subsystem tests: debug validators, checkpointing, timers, metrics."""

import os

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core import vecmath as vm
from raytracer_tpu.utils import checkpoint, debug
from raytracer_tpu.utils.stats import mrays_per_second
from raytracer_tpu.utils.timer import FrameTimer, ScopeTimer


def test_check_refraction_validates_snell():
    n = 64
    rng = np.random.default_rng(0)
    d = vm.normalize(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    nrm = vm.normalize(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    nrm = jnp.where(vm.dot(d, nrm)[:, None] > 0, -nrm, nrm)
    n1 = jnp.full((n,), 1.0)
    n2 = jnp.full((n,), 1.5)
    cos = -vm.dot(d, nrm)
    eta = n1 / n2
    k = 1.0 - eta * eta * (1.0 - cos * cos)
    r = vm.refract(d, nrm, eta, cos, k)
    mask = k > 0
    ok = debug.check_refraction(n1, n2, d, nrm, r, mask)
    assert bool(jnp.all(ok))
    # corrupt one lane -> must be caught
    r_bad = r.at[0].set(jnp.asarray([0.0, 1.0, 0.0]))
    ok2 = debug.check_refraction(n1, n2, d, nrm, r_bad, mask)
    if bool(mask[0]):
        assert not bool(ok2[0])


def test_obj_dumpers(tmp_path):
    p0 = np.zeros((2, 3))
    p1 = np.eye(3)[None, 0].repeat(2, 0)
    p2 = np.eye(3)[None, 1].repeat(2, 0)
    path = os.path.join(tmp_path, "tris.obj")
    debug.obj_write_triangles(path, p0, p1, p2)
    text = open(path).read()
    assert text.count("v ") == 6 and text.count("f ") == 2
    path2 = os.path.join(tmp_path, "boxes.obj")
    debug.obj_write_aabbs(path2, np.zeros((1, 3)), np.ones((1, 3)))
    assert open(path2).read().count("v ") == 8


def test_checkpoint_roundtrip(tmp_path):
    import optax

    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(4)}
    opt = optax.adam(1e-2)
    state = opt.init({k: jnp.asarray(v) for k, v in params.items()})
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(path, params, state, step=7)
    p2, s2, step = checkpoint.restore(path, state)
    assert step == 7
    np.testing.assert_array_equal(p2["a"], params["a"])
    assert s2 is not None


def test_timers_and_metrics():
    with ScopeTimer("x", quiet=True) as t:
        pass
    assert t.elapsed >= 0.0
    ft = FrameTimer(window=2)
    ft.tick()
    ft.tick()
    assert ft.fps > 0

    class S:
        num_primary, num_shadow, num_reflection, num_refraction = 100, 50, 10, 5
        num_dropped, num_incomplete = 0, 0

    m = mrays_per_second(S, 0.5)
    assert abs(m["total_mrays_s"] - 165 / 0.5 / 1e6) < 1e-12
