"""Multi-chip sharding correctness on the virtual 8-device CPU mesh
(SURVEY.md section 4 test plan (d))."""

import numpy as np
import pytest

import raytrace_tpu  # noqa: F401
import jax

from raytrace_tpu import create_image
from raytrace_tpu.parallel import collectives
from raytrace_tpu.parallel.mesh import make_mesh
from raytrace_tpu.parallel.sharding import create_image_sharded
from raytrace_tpu.structures import IntensityStep
from raytrace_tpu.testing import synthetic_problem

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@needs_mesh
@pytest.mark.parametrize("seeded", [False, True])
def test_sharded_matches_single(seeded):
    p1 = synthetic_problem(seeded=seeded)
    img1, ang1 = create_image(p1, "lax")
    mesh = make_mesh(8)
    p8 = synthetic_problem(seeded=seeded)
    img8, ang8 = create_image_sharded(p8, mesh, "lax")
    # deposits run in float32 per shard (dense path on single device vs
    # scatter on the mesh), so agreement is at f32 summation level
    assert np.linalg.norm(img1 - img8) / np.linalg.norm(img1) < 2e-6
    assert np.linalg.norm(ang1 - ang8) / np.linalg.norm(ang1) < 2e-6


@needs_mesh
@pytest.mark.parametrize("seeded", [False, True])
def test_sharded_pallas_matches_single(seeded):
    """The fastest backend runs per shard (no silent lax downgrade) -- the
    reference's multi-GPU path likewise drives its CUDA kernel per device
    (src/RayTraceImage.cpp:396-405). Off-TPU the kernel executes via the
    Pallas interpreter."""
    p1 = synthetic_problem(seeded=seeded)
    img1, ang1 = create_image(p1, "lax")
    mesh = make_mesh(8)
    p8 = synthetic_problem(seeded=seeded)
    img8, ang8 = create_image_sharded(p8, mesh, "pallas")
    assert np.linalg.norm(img1 - img8) / np.linalg.norm(img1) < 2e-6
    assert np.linalg.norm(ang1 - ang8) / np.linalg.norm(ang1) < 2e-6


@needs_mesh
def test_sharded_mesh_sizes():
    """Any mesh size (including 1 = the no-MPI shim analogue) gives the
    same images."""
    ref_img = None
    for n in (1, 2, 4):
        p = synthetic_problem()
        mesh = make_mesh(n)
        img, _ = create_image_sharded(p, mesh, "lax")
        if ref_img is None:
            ref_img = img
        else:
            assert np.linalg.norm(img - ref_img) / np.linalg.norm(ref_img) < 2e-6


def test_gather_all_identity_without_mesh():
    # single-process: one rank row holding this rank's values (no-MPI shim)
    out = collectives.gather_all([1.0, 2.0], None)
    assert out.shape == (1, 2) and np.array_equal(out[0], [1.0, 2.0])


def test_intensity_step_sum_reduce_no_mesh():
    step = IntensityStep().initialize(4, 3, 2, 2, 5, 1)
    step.image[:] = 1.0
    step.sum_reduce()  # single host: identity
    assert np.all(step.image == 1.0)
    assert step.valid()
    step.E_v[0] = -1.0
    assert not step.valid()


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import importlib
    graft = importlib.import_module("__graft_entry__")
    if len(jax.devices()) >= 8:
        graft.dryrun_multichip(8)
    fn, args = graft.entry()
    img, ang = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(img)))
