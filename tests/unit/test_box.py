"""Box/PBC unit tests (Domain::pbc / minimum image; SURVEY.md §2a row 4)."""

import jax.numpy as jnp
import numpy as np

from meso_tpu.core.box import Box


def test_wrap_inside_noop():
    box = Box.cubic(10.0)
    x = jnp.asarray([[1.0, 5.0, 9.9]])
    img = jnp.zeros((1, 3), jnp.int32)
    xw, im = box.wrap(x, img)
    assert np.allclose(xw, x)
    assert (np.asarray(im) == 0).all()


def test_wrap_far_outside_single_shot():
    box = Box.cubic(10.0)
    x = jnp.asarray([[25.0, -13.0, 10.0]])
    img = jnp.zeros((1, 3), jnp.int32)
    xw, im = box.wrap(x, img)
    assert np.allclose(xw, [[5.0, 7.0, 0.0]])
    assert (np.asarray(im) == [[2, -2, 1]]).all()
    assert (np.asarray(xw) < 10.0).all() and (np.asarray(xw) >= 0.0).all()


def test_min_image():
    box = Box.orthorhombic(10.0, 20.0, 30.0)
    dr = jnp.asarray([[9.0, -19.0, 1.0]])
    mi = np.asarray(box.min_image(dr))
    assert np.allclose(mi, [[-1.0, 1.0, 1.0]])


def test_unwrap_roundtrip():
    box = Box.cubic(7.0)
    x0 = jnp.asarray([[6.5, 0.5, 3.0]])
    img = jnp.zeros((1, 3), jnp.int32)
    x1, im1 = box.wrap(x0 + jnp.asarray([[1.0, -1.0, 0.0]]), img)
    unwrapped = np.asarray(x1) + np.asarray(im1) * 7.0
    assert np.allclose(unwrapped, [[7.5, -0.5, 3.0]])
