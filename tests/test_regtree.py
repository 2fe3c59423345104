"""Regression-tree fMLLR / MLLR (transform/regression-tree.cc +
regtree-fmllr-diag-gmm.cc + regtree-mllr-diag-gmm.cc roles)."""

import jax.numpy as jnp
import numpy as np

from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.ops import gmm_kernels as K
from voicebridge_tpu.transforms.fmllr import estimate_fmllr
from voicebridge_tpu.transforms.regtree import (acc_regtree_fmllr_stats,
                                                acc_regtree_mllr_stats,
                                                apply_regtree_mllr,
                                                build_regression_tree,
                                                choose_regression_classes,
                                                estimate_regtree_fmllr,
                                                estimate_regtree_mllr,
                                                regtree_fmllr_loglikes)

RNG = np.random.default_rng(11)


def two_group_gmm(dim=6, mix=2):
    """pdfs 0..2 cluster near -8, pdfs 3..5 near +8 (clearly separable)."""
    means = np.zeros((6, mix, dim))
    means[:3] = -8.0 + RNG.standard_normal((3, mix, dim))
    means[3:] = 8.0 + RNG.standard_normal((3, mix, dim))
    variances = 0.5 + RNG.random((6, mix, dim))
    w = np.full((6, mix), 1.0 / mix)
    return AmDiagGmm((means / variances).astype(np.float32),
                     (1.0 / variances).astype(np.float32),
                     w.astype(np.float32))


def sample(am, n):
    p = RNG.integers(0, am.num_pdfs, n).astype(np.int32)
    means, variances = am.means(), am.variances()
    x = np.zeros((n, am.dim), np.float32)
    for i in range(n):
        m = RNG.choice(am.max_mix)
        x[i] = means[p[i], m] + RNG.standard_normal(am.dim) * np.sqrt(
            variances[p[i], m])
    return x, p


class TestRegressionTree:
    def test_tree_separates_groups(self):
        am = two_group_gmm()
        tree = build_regression_tree(am.means(), am.weights, 2)
        assert tree.num_leaves == 2
        # all Gaussians of pdfs 0-2 in one leaf, 3-5 in the other
        bc = tree.bclass_of
        assert len(set(bc[:3].ravel())) == 1
        assert len(set(bc[3:].ravel())) == 1
        assert bc[0, 0] != bc[5, 0]
        # parents form a single rooted tree
        assert (tree.parent == -1).sum() == 1

    def test_choose_classes_fallback(self):
        am = two_group_gmm()
        tree = build_regression_tree(am.means(), am.weights, 4)
        occ = np.array([10.0, 10.0, 10.0, 10.0])
        # min_count larger than total -> everything maps to one class (root)
        l2c, nodes = choose_regression_classes(tree, occ, 1e6)
        assert len(nodes) == 1 and (l2c == 0).all()
        # min_count below leaf occupancy -> each leaf its own class
        l2c, nodes = choose_regression_classes(tree, occ, 5.0)
        assert len(nodes) == tree.num_leaves


class TestRegtreeFmllr:
    def _adapted_data(self, am, n=3000):
        """Apply a different affine transform to each spatial group."""
        x, p = sample(am, n)
        a1 = np.eye(am.dim) + 0.25 * RNG.standard_normal((am.dim, am.dim))
        b1 = 2.0 * RNG.standard_normal(am.dim)
        a2 = np.eye(am.dim) + 0.25 * RNG.standard_normal((am.dim, am.dim))
        b2 = -1.5 * RNG.standard_normal(am.dim)
        grp2 = p >= 3
        x_adapt = np.where(grp2[:, None], x @ a2.T + b2, x @ a1.T + b1)
        return x_adapt.astype(np.float32), p

    def test_two_class_beats_global(self):
        am = two_group_gmm()
        x, p = self._adapted_data(am)
        params = K.pack_gmm(am)
        tree = build_regression_tree(am.means(), am.weights, 2)
        w1 = jnp.ones(len(p), np.float32)
        beta, k, g = acc_regtree_fmllr_stats(
            params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
            jnp.asarray(x), jnp.asarray(p), w1, tree.bclass_of, 2)
        beta, k, g = np.asarray(beta), np.asarray(k), np.asarray(g)

        # global (single-class) transform from pooled stats
        w_glob, _ = estimate_fmllr(beta.sum(), k.sum(0), g.sum(0),
                                   min_count=1.0)
        # regression-tree: one transform per leaf
        w_tree, l2c, imprs = estimate_regtree_fmllr(tree, beta, k, g,
                                                    min_count=10.0)
        assert w_tree.shape[0] == 2
        ll_tree = np.asarray(regtree_fmllr_loglikes(
            params, jnp.asarray(x), w_tree, l2c, tree.bclass_of))
        ll_glob = np.asarray(regtree_fmllr_loglikes(
            params, jnp.asarray(x), w_glob[None],
            np.zeros(2, np.int32), tree.bclass_of))
        ll_none = np.asarray(K.loglikes(params, jnp.asarray(x)))
        n = len(p)
        t = ll_tree[np.arange(n), p].mean()
        gl = ll_glob[np.arange(n), p].mean()
        no = ll_none[np.arange(n), p].mean()
        assert gl > no + 0.1, (gl, no)   # adaptation helps
        assert t > gl + 0.1, (t, gl)     # two transforms beat one

    def test_min_count_degrades_to_global(self):
        am = two_group_gmm()
        x, p = self._adapted_data(am, n=800)
        params = K.pack_gmm(am)
        tree = build_regression_tree(am.means(), am.weights, 2)
        w1 = jnp.ones(len(p), np.float32)
        beta, k, g = acc_regtree_fmllr_stats(
            params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
            jnp.asarray(x), jnp.asarray(p), w1, tree.bclass_of, 2)
        beta, k, g = np.asarray(beta), np.asarray(k), np.asarray(g)
        w_tree, l2c, _ = estimate_regtree_fmllr(tree, beta, k, g,
                                                min_count=1e7)
        w_glob, _ = estimate_fmllr(beta.sum(), k.sum(0), g.sum(0),
                                   min_count=1.0)
        assert w_tree.shape[0] == 1 and (l2c == 0).all()
        np.testing.assert_allclose(w_tree[0], w_glob, atol=1e-4)


class TestRegtreeMllr:
    def test_recovers_mean_shift(self):
        am = two_group_gmm()
        x, p = sample(am, 4000)
        shift = np.zeros((2, am.dim), np.float32)
        shift[0] = 1.5
        shift[1] = -2.0
        grp = (p >= 3).astype(int)
        x_shifted = (x + shift[grp]).astype(np.float32)
        params = K.pack_gmm(am)
        tree = build_regression_tree(am.means(), am.weights, 2)
        occ, xbar = acc_regtree_mllr_stats(params, jnp.asarray(x_shifted),
                                           jnp.asarray(p),
                                           jnp.ones(len(p), np.float32))
        xf, l2c = estimate_regtree_mllr(tree, np.asarray(occ), np.asarray(xbar),
                                        am.means(), am.inv_vars,
                                        min_count=10.0)
        assert xf.shape[0] == 2
        new_means = apply_regtree_mllr(am.means(), tree, xf, l2c)
        # adapted model likes the shifted data more
        am2 = AmDiagGmm((new_means * am.inv_vars).astype(np.float32),
                        am.inv_vars, am.weights)
        ll_old = np.asarray(K.loglikes(params, jnp.asarray(x_shifted)))
        ll_new = np.asarray(K.loglikes(K.pack_gmm(am2), jnp.asarray(x_shifted)))
        n = len(p)
        assert ll_new[np.arange(n), p].mean() > ll_old[np.arange(n), p].mean() + 0.5
        # group-level shift direction/magnitude (the A/b split is not unique
        # when a group's means are tightly clustered, so check the aggregate)
        d0 = float((new_means[:3] - am.means()[:3]).mean())
        d1 = float((new_means[3:] - am.means()[3:]).mean())
        assert abs(d0 - 1.5) < 0.5, d0
        assert abs(d1 + 2.0) < 0.5, d1
