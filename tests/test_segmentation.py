"""Segmentation backends: structural properties on synthetic images."""

import numpy as np
import pytest

from stereo_tpu.proposals import segmentation


@pytest.fixture(scope="module")
def blocks_image():
    """Three clearly separated constant blocks + mild noise."""
    rng = np.random.default_rng(0)
    H, W = 40, 60
    im = np.zeros((H, W, 3))
    im[:, :20] = [200, 30, 30]
    im[:, 20:40] = [30, 200, 30]
    im[:, 40:] = [30, 30, 200]
    im += rng.normal(0, 2.0, im.shape)
    return np.clip(im, 0, 255)


def segments_respect_blocks(labels):
    # most pixels of each band share one label, and bands differ
    a = np.bincount(labels[:, :20].ravel()).argmax()
    b = np.bincount(labels[:, 20:40].ravel()).argmax()
    c = np.bincount(labels[:, 40:].ravel()).argmax()
    assert len({a, b, c}) == 3
    assert (labels[:, :20] == a).mean() > 0.9
    assert (labels[:, 20:40] == b).mean() > 0.9
    assert (labels[:, 40:] == c).mean() > 0.9


def test_felzenszwalb_blocks(blocks_image):
    labels = segmentation.felzenszwalb(blocks_image, sigma=0.0, k=100.0,
                                       min_size=10)
    assert labels.min() >= 1
    segments_respect_blocks(labels)


def test_felzenszwalb_min_size(blocks_image):
    labels = segmentation.felzenszwalb(blocks_image, sigma=0.5, k=50.0,
                                       min_size=30)
    sizes = np.bincount(labels.ravel())[1:]
    assert (sizes[sizes > 0] >= 30).all()


def test_mean_shift_blocks(blocks_image):
    labels = segmentation.mean_shift(blocks_image, h_s=4, h_r=5.0,
                                     min_region=10)
    assert labels.min() >= 1
    segments_respect_blocks(labels)


def test_mean_shift_uniform_image_single_segment():
    im = np.full((20, 30, 3), 128.0)
    labels = segmentation.mean_shift(im, h_s=4, h_r=5.0, min_region=0)
    assert labels.max() == 1


def test_luv_known_values():
    """White and black map to L=100 / L=0, u,v near 0."""
    import jax.numpy as jnp

    white = segmentation.rgb_to_luv(jnp.asarray([[[255.0, 255.0, 255.0]]]))
    black = segmentation.rgb_to_luv(jnp.asarray([[[0.0, 0.0, 0.0]]]))
    assert float(white[0, 0, 0]) == pytest.approx(100.0, abs=0.5)
    assert float(black[0, 0, 0]) == 0.0
    assert abs(float(white[0, 0, 1])) < 2.0
