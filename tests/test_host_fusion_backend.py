"""Host (exact QPBO) fusion backend on the models + the ``improve`` knob.

The reference's binary fusion is rd.m -> rd_mex.cpp: QPBO with weak
persistency, keep-current where unlabelled, and QPBO-I when unlabelled
remain and options.improve is set (rd_mex.cpp:68-92).  The models expose
this path as fusion_backend='host'; it must be monotone and agree with the
device path's accepted energies to solver tolerance.
"""

import numpy as np
import pytest

from stereo_tpu import geometry
from stereo_tpu.models.ncc import DispMapNCC


def make_model(**kw):
    rng = np.random.default_rng(0)
    H, W = 20, 30
    im1 = rng.uniform(0, 255, (H, W, 3))
    im0 = np.roll(im1, 3, axis=1) + rng.normal(0, 2, (H, W, 3))
    return DispMapNCC([im0, im1], np.arange(0, 7), kernel=1,
                      unary_weight=40.0, tol=8.0, **kw)


@pytest.fixture(scope="module")
def host_model():
    return make_model(fusion_backend="host", improve=True)


def test_host_fusion_monotone(host_model):
    m = host_model
    H, W = m.sz
    e_prev = m.energy()
    for d in [0.0, 3.0, 6.0]:
        e, lb = m.binary_fusion(geometry.fronto_parallel(H, W, d, m.dtype))
        assert e <= e_prev + 1e-4
        assert lb <= e + 1e-6
        e_prev = e


def test_host_and_device_moves_agree():
    """Same proposal stream through both backends: energies agree closely
    (both solve the same fusion problems to (near-)optimality)."""
    mh = make_model(fusion_backend="host", improve=True)
    md = make_model(fusion_backend="device")
    H, W = mh.sz
    for d in [0.0, 2.0, 4.0, 6.0]:
        prop = geometry.fronto_parallel(H, W, d, mh.dtype)
        eh, _ = mh.binary_fusion(prop)
        ed, _ = md.binary_fusion(prop)
        assert ed == pytest.approx(eh, rel=2e-3)


def test_bad_backend_rejected():
    with pytest.raises(ValueError):
        make_model(fusion_backend="quantum")
