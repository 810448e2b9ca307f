import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmde_tpu import geometry as geo


def random_rotation(rng):
    w = rng.standard_normal(3)
    return geo.exp_so3(w)


class TestHostGeometry:
    def test_skew_antisymmetric(self):
        x = np.array([1.0, 2.0, 3.0])
        S = geo.skew(x)
        assert np.allclose(S, -S.T)
        v = np.array([0.5, -1.0, 2.0])
        assert np.allclose(S @ v, np.cross(x, v))

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            w = rng.standard_normal(3)
            w = w / np.linalg.norm(w) * rng.uniform(1e-4, np.pi - 1e-3)
            R = geo.exp_so3(w)
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
            assert np.isclose(np.linalg.det(R), 1.0)
            w2 = geo.log_so3(R)
            assert np.allclose(w, w2, atol=1e-8)

    def test_exp_small_angle(self):
        w = np.array([1e-10, 0, 0])
        R = geo.exp_so3(w)
        assert np.allclose(R, np.eye(3) + geo.skew(w))

    def test_se3_inverse(self):
        rng = np.random.default_rng(1)
        R = random_rotation(rng)
        t = rng.standard_normal(3)
        T = geo.se3(t, R)
        assert np.allclose(T @ geo.inv_se3(T), np.eye(4), atol=1e-10)

    def test_relative_pose_composition(self):
        """T12 maps: world pose1 composed with T12 gives world pose2."""
        rng = np.random.default_rng(2)
        T01 = geo.se3(rng.standard_normal(3), random_rotation(rng))
        T02 = geo.se3(rng.standard_normal(3), random_rotation(rng))
        T12 = geo.relative_pose(T01, T02)
        assert np.allclose(T01 @ T12, T02, atol=1e-10)

    def test_relative_pose_cycle(self):
        rng = np.random.default_rng(3)
        T01 = geo.se3(rng.standard_normal(3), random_rotation(rng))
        T02 = geo.se3(rng.standard_normal(3), random_rotation(rng))
        T12 = geo.relative_pose(T01, T02)
        T21 = geo.relative_pose(T02, T01)
        assert np.allclose(T12 @ T21, np.eye(4), atol=1e-10)

    def test_relative_pose_parts_shapes(self):
        rng = np.random.default_rng(4)
        T01 = geo.se3(rng.standard_normal(3), random_rotation(rng))
        T02 = geo.se3(rng.standard_normal(3), random_rotation(rng))
        RT, T, R, w, aa = geo.relative_pose_parts(T01, T02)
        assert RT.shape == (4, 4) and T.shape == (3, 1)
        assert R.shape == (3, 3) and w.shape == (3, 1) and aa.shape == (4, 1)
        # axis-angle decomposition reconstructs w
        assert np.allclose(aa[:3] * aa[3], w, atol=1e-10)


class TestJaxGeometry:
    def test_exp_so3_matches_numpy(self):
        rng = np.random.default_rng(5)
        W = rng.standard_normal((16, 3))
        R_jax = np.asarray(geo.exp_so3_jax(jnp.asarray(W)))
        for i in range(16):
            assert np.allclose(R_jax[i], geo.exp_so3(W[i]), atol=1e-5)

    def test_exp_so3_jax_zero(self):
        R = np.asarray(geo.exp_so3_jax(jnp.zeros((1, 3))))
        assert np.allclose(R[0], np.eye(3), atol=1e-6)

    def test_exp_so3_jax_grad_at_zero_finite(self):
        g = jax.grad(lambda w: jnp.sum(geo.exp_so3_jax(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_log_so3_matches_numpy(self):
        rng = np.random.default_rng(6)
        Ws = rng.standard_normal((8, 3)) * 0.8
        Rs = np.stack([geo.exp_so3(w) for w in Ws])
        w_jax = np.asarray(geo.log_so3_jax(jnp.asarray(Rs)))
        assert np.allclose(w_jax, Ws, atol=1e-5)

    def test_normalize_rotation_orthonormal(self):
        rng = np.random.default_rng(7)
        noisy = np.stack([random_rotation(rng) + 0.05 * rng.standard_normal((3, 3))
                          for _ in range(4)])
        out = np.asarray(geo.normalize_rotation(jnp.asarray(noisy.reshape(4, 9))))
        R = out.reshape(4, 3, 3)
        for i in range(4):
            assert np.allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)

    def test_normalize_rotation_matches_torch_svd_semantics(self):
        """U @ Vh with no det correction — same as reference util.py:5-17."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(8)
        M = rng.standard_normal((3, 3, 3)).astype(np.float32)
        ours = np.asarray(geo.normalize_rotation(jnp.asarray(M.reshape(3, 9))))
        for i in range(3):
            U, _, Vh = torch.linalg.svd(torch.from_numpy(M[i]), full_matrices=False)
            expect = (U @ torch.eye(3) @ Vh).numpy().reshape(-1)
            # U @ Vh is the (unique) orthogonal polar factor, so the products
            # match even though the SVD factors themselves are sign-ambiguous.
            assert np.allclose(ours[i], expect, atol=1e-4)
