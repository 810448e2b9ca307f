import numpy as np
import jax.numpy as jnp

from mmde_tpu.train import tta


class TestFlipTTA:
    def test_symmetric_function_unchanged(self):
        """For a flip-equivariant forward (here: identity on a channel
        reduction), flip averaging must reproduce the plain output."""
        def forward(x):
            return jnp.mean(x, axis=-1, keepdims=True)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((2, 8, 12, 3)).astype(np.float32))
        out = tta.flip_average(forward, img)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(forward(img)), rtol=1e-6)

    def test_averages_asymmetric_function(self):
        """A forward that depends on absolute column index gets symmetrized."""
        def forward(x):
            W = x.shape[2]
            col = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
            return jnp.broadcast_to(col, x.shape[:3] + (1,))
        img = jnp.zeros((1, 4, 6, 3))
        out = np.asarray(tta.flip_average(forward, img))
        # average of col and (W-1-col) = (W-1)/2 everywhere
        np.testing.assert_allclose(out, (6 - 1) / 2.0)


class TestShiftWindow:
    def test_positions_cover_width(self):
        xs = tta.shift_window_positions(640, 480, 240)
        assert xs[0] == 0 and xs[-1] == 640 - 480
        assert all(xs[i + 1] > xs[i] for i in range(len(xs) - 1))

    def test_identity_forward_recomposes_exactly(self):
        """If the model returns its input, the recomposed sliding-window
        output must equal the input (coverage-weighted average of identical
        values)."""
        def forward(x):
            return x[..., :1]
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((1, 16, 40, 3)).astype(np.float32))
        out = tta.shift_window_eval(forward, img, crop=16, stride=8)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(img[..., :1]), rtol=1e-5)

    def test_coverage_weighting(self):
        """A forward returning all-ones recomposes to exactly ones (counts
        cancel)."""
        def forward(x):
            return jnp.ones(x.shape[:3] + (1,))
        img = jnp.zeros((2, 8, 30, 3))
        out = np.asarray(tta.shift_window_eval(forward, img, crop=8,
                                               stride=5))
        np.testing.assert_allclose(out, 1.0, rtol=1e-6)
