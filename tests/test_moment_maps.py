"""Moment-map orientation must equal the reference patch-gather form."""

import jax.numpy as jnp
import numpy as np

from pyorbslam_tpu.io.synthetic import make_texture
from pyorbslam_tpu.ops import orb_descriptor as dsc
from pyorbslam_tpu.ops import pyramid as pyr


class TestMomentMaps:
    def test_matches_patch_gather_form(self):
        img = jnp.asarray(make_texture(512, seed=9)[:240, :320], jnp.float32)
        padded = pyr.reflect_pad(img, dsc.BORDER)
        rng = np.random.default_rng(0)
        xy = np.stack([
            rng.integers(20, 300, 200), rng.integers(20, 220, 200)
        ], 1).astype(np.int32)

        ang_ref = np.asarray(dsc.ic_angle(padded, jnp.asarray(xy)))
        m10, m01 = dsc.moment_maps(padded)
        ang_fast = np.asarray(dsc.ic_angle_from_maps(m10, m01, jnp.asarray(xy)))

        d = np.abs(((ang_fast - ang_ref) + 180) % 360 - 180)
        assert d.max() < 0.1, f"max angle diff {d.max()} deg"
