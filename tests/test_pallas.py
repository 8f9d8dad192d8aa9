"""Pallas FAST kernel vs the jnp reference implementation (interpret mode
on CPU; the real kernel runs on TPU)."""

import jax.numpy as jnp
import numpy as np

from pyorbslam_tpu.io.synthetic import make_texture
from pyorbslam_tpu.ops import fast as fast_ops
from pyorbslam_tpu.ops.pallas_kernels import fast_score_map_pallas


class TestPallasFast:
    def test_matches_jnp_interior(self):
        img = jnp.asarray(make_texture(512, seed=3)[:200, :300], jnp.float32)
        ref = np.asarray(fast_ops.fast_score_map(img))
        got = np.asarray(fast_score_map_pallas(img, interpret=True))
        # interiors must agree exactly; column borders differ by design
        b = 4
        np.testing.assert_allclose(got[b:-b, b:-b], ref[b:-b, b:-b], atol=1e-5)

    def test_nonmultiple_shapes(self):
        img = jnp.asarray(make_texture(512, seed=4)[:97, :211], jnp.float32)
        ref = np.asarray(fast_ops.fast_score_map(img))
        got = np.asarray(fast_score_map_pallas(img, interpret=True))
        b = 4
        np.testing.assert_allclose(got[b:-b, b:-b], ref[b:-b, b:-b], atol=1e-5)
