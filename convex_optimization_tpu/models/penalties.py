"""Nonsmooth penalty families with prox, dual norm, and gap-safe screening.

The composite objective solved by this framework is

    P(x) = 0.5 * ||A x - b||^2 + (lam2 / 2) * ||x||^2 + g(x)

where ``g`` is one of the penalties below.  The ``lam2`` ridge term lives in
the *smooth* part of the objective (on ``Problem``), so the elastic net needs
no penalty of its own: it is ``l1`` + ``lam2 > 0``.

Duality conventions (used by core/objective.py):

Let ``rho = b - A x`` and the *augmented* residual ``rho~ = [rho; -sqrt(lam2) x]``
(the elastic net is the lasso on the augmented matrix ``A~ = [A; sqrt(lam2) I]``).
Then ``z = A~^T rho~ = A^T rho - lam2 * x`` and the Fenchel dual of ``P`` is

    D(theta) = <theta~, b~> - 0.5 * ||theta~||^2      s.t.  dual_norm(A~^T theta~) <= 1

with ``dual_norm`` scaled so that feasibility reads ``<= 1`` (it folds lam1 in).
A feasible point is obtained by scaling the residual:
``theta~ = alpha * rho~`` with ``alpha = 1 / max(1, dual_norm(z))``.

Gap-safe screening (cf. the screening capability, SURVEY.md C11): with a
feasible ``theta`` and gap ``G = P(x) - D(theta)``, the safe-sphere radius in
these (unnormalized) units is ``R = sqrt(2 G)`` and a coordinate/group ``j``
can be fixed at zero whenever its dual witness plus ``R * ||A~_j||`` stays
strictly inside the dual constraint.

All methods are pure and jittable; ``Penalty`` is a registered pytree whose
``kind``/``ngroups`` are static metadata (so solver jits specialize per family).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def soft_threshold(v: jax.Array, t) -> jax.Array:
    """Elementwise soft-thresholding: prox of ``t * ||.||_1``."""
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lam1", "weights"],
    meta_fields=["kind", "ngroups"],
)
@dataclasses.dataclass(frozen=True)
class Penalty:
    """A nonsmooth penalty ``g``.

    kind:
      - ``"l1"``:        g(x) = lam1 * ||x||_1
      - ``"nonneg_l1"``: g(x) = lam1 * ||x||_1 + indicator(x >= 0)
      - ``"group_l2"``:  g(x) = lam1 * sum_g weights_g * ||x_g||_2,
                         groups = contiguous, equal-size reshape to (ngroups, n//ngroups)

    lam1 is a scalar (traced ok — lambda-path re-uses one compiled solver).
    weights is None or an (ngroups,) array of positive group weights.
    """

    lam1: jax.typing.ArrayLike
    kind: str = "l1"
    ngroups: int = 0
    weights: Optional[jax.Array] = None

    # -- helpers ---------------------------------------------------------

    def _grouped(self, x: jax.Array) -> jax.Array:
        return x.reshape(self.ngroups, -1)

    def _gweights(self, dtype) -> jax.Array:
        if self.weights is None:
            return jnp.ones((self.ngroups,), dtype=dtype)
        return self.weights.astype(dtype)

    def with_lam1(self, lam1) -> "Penalty":
        return dataclasses.replace(self, lam1=lam1)

    # -- g(x) ------------------------------------------------------------

    def value(self, x: jax.Array) -> jax.Array:
        if self.kind in ("l1", "nonneg_l1"):
            return self.lam1 * jnp.sum(jnp.abs(x))
        elif self.kind == "group_l2":
            gn = jnp.linalg.norm(self._grouped(x), axis=1)
            return self.lam1 * jnp.sum(self._gweights(x.dtype) * gn)
        raise ValueError(f"unknown penalty kind {self.kind!r}")

    # -- prox_{t g}(v) ----------------------------------------------------

    def prox(self, v: jax.Array, t) -> jax.Array:
        """argmin_u  t*g(u) + 0.5*||u - v||^2, vectorized and jittable."""
        tl = t * self.lam1
        if self.kind == "l1":
            return soft_threshold(v, tl)
        elif self.kind == "nonneg_l1":
            return jnp.maximum(v - tl, 0.0)
        elif self.kind == "group_l2":
            vg = self._grouped(v)
            gn = jnp.linalg.norm(vg, axis=1, keepdims=True)
            w = self._gweights(v.dtype)[:, None]
            # scale = max(0, 1 - t*lam1*w/||v_g||); guard ||v_g|| = 0.
            scale = jnp.maximum(0.0, 1.0 - tl * w / jnp.maximum(gn, 1e-30))
            return (vg * scale).reshape(v.shape)
        raise ValueError(f"unknown penalty kind {self.kind!r}")

    def value_diff(self, x: jax.Array, dx: jax.Array) -> jax.Array:
        """g(x + dx) - g(x), computed WITHOUT the difference-of-large-sums
        cancellation (needed by f32 line searches: near convergence the true
        difference is far below eps * g(x)).

        l1: per-element |x+d| - |x| equals sign(x)*d exactly when the sign
        does not flip; the flip branch only fires where |x| <= |d|, so every
        summand is O(|dx_i|) and the sum's rounding error is O(eps*||dx||_1).
        group_l2: ||a+d|| - ||a|| = (2<a,d> + ||d||^2) / (||a+d|| + ||a||).
        """
        if self.kind in ("l1", "nonneg_l1"):
            xn = x + dx
            same_sign = (xn * x > 0)
            diff = jnp.where(same_sign, jnp.sign(x) * dx,
                             jnp.abs(xn) - jnp.abs(x))
            return self.lam1 * jnp.sum(diff)
        elif self.kind == "group_l2":
            xg = self._grouped(x)
            dg = self._grouped(dx)
            n_old = jnp.linalg.norm(xg, axis=1)
            n_new = jnp.linalg.norm(xg + dg, axis=1)
            num = 2.0 * jnp.sum(xg * dg, axis=1) + jnp.sum(dg * dg, axis=1)
            diff = num / jnp.maximum(n_new + n_old, 1e-30)
            return self.lam1 * jnp.sum(self._gweights(x.dtype) * diff)
        raise ValueError(f"unknown penalty kind {self.kind!r}")

    def prox_block(self, v: jax.Array, t, block_idx, n_total: int) -> jax.Array:
        """Prox restricted to one contiguous column block (for block-CD sweeps).

        For separable penalties this is just ``prox``.  For group_l2 the block
        must contain whole groups (the BCD scheduler enforces
        ``block_size % group_size == 0``); ``block_idx`` may be a traced index.
        """
        if self.kind in ("l1", "nonneg_l1"):
            return self.prox(v, t)
        elif self.kind == "group_l2":
            gsize = n_total // self.ngroups
            B = v.shape[0]
            gpb = B // gsize  # groups per block
            vg = v.reshape(gpb, gsize)
            w = jax.lax.dynamic_slice(
                self._gweights(v.dtype), (block_idx * gpb,), (gpb,)
            )[:, None]
            gn = jnp.linalg.norm(vg, axis=1, keepdims=True)
            scale = jnp.maximum(0.0, 1.0 - t * self.lam1 * w / jnp.maximum(gn, 1e-30))
            return (vg * scale).reshape(v.shape)
        raise ValueError(f"unknown penalty kind {self.kind!r}")

    # -- dual norm (feasibility reads dual_norm(z) <= 1) -------------------

    def dual_norm(self, z: jax.Array) -> jax.Array:
        if self.kind == "l1":
            return jnp.max(jnp.abs(z)) / self.lam1
        elif self.kind == "nonneg_l1":
            # one-sided: g*(u) = 0 iff u_j <= lam1 for all j
            return jnp.max(z) / self.lam1
        elif self.kind == "group_l2":
            gn = jnp.linalg.norm(self._grouped(z), axis=1)
            return jnp.max(gn / self._gweights(z.dtype)) / self.lam1
        raise ValueError(f"unknown penalty kind {self.kind!r}")

    # -- gap-safe screening -------------------------------------------------

    def screen_keep(
        self,
        z: jax.Array,
        alpha: jax.Array,
        gap: jax.Array,
        col_norms: jax.Array,
        r_norm: jax.Array | float = 0.0,
        primal: jax.Array | float = 0.0,
    ) -> jax.Array:
        """Gap-safe sphere test.  Returns a boolean keep-mask of shape (n,).

        z:         A~^T rho~ (unscaled dual witness), shape (n,)
        alpha:     residual scaling making theta = alpha*rho~ feasible
        gap:       duality gap P(x) - D(theta) at the same point
        col_norms: per-column norms of the *augmented* matrix
                   (sqrt(||A_j||^2 + lam2)), shape (n,)
        r_norm, primal: pass ||r|| and |P(x)| to make the test safe under
                   the WORKING precision's rounding: the witness carries
                   |dz_j| <= gamma ||A_j|| ||r|| tree-reduction error and
                   the gap O(gamma |P|) — without the inflation an ACTIVE
                   coordinate sits exactly on the sphere boundary and f32
                   noise discards it (observed on group-sparse instances).
                   gamma derives from z.dtype, so f64 callers pay nothing.

        keep == False certifies x*_j = 0 at this lam1 (safe to fix & freeze).
        """
        # (log2 m + 4) eps with log2 m <= 28 folded into a constant: the
        # row count is not known here and 32 eps covers every m <= 2^28
        gamma = 32.0 * jnp.finfo(z.dtype).eps
        gap_safe = gap + gamma * jnp.abs(primal)
        radius = jnp.sqrt(jnp.maximum(2.0 * gap_safe, 0.0))
        witness = alpha * z
        margin = alpha * gamma * col_norms * r_norm
        if self.kind == "l1":
            discard = (jnp.abs(witness) + margin
                       + radius * col_norms < self.lam1)
        elif self.kind == "nonneg_l1":
            discard = witness + margin + radius * col_norms < self.lam1
        elif self.kind == "group_l2":
            wg = self._grouped(witness)
            gn = jnp.linalg.norm(wg, axis=1)
            # Frobenius bound on ||A~_g||_2 — safe (>= spectral norm).
            gcol = jnp.sqrt(jnp.sum(self._grouped(col_norms**2), axis=1))
            # ||z_g + dz_g|| <= ||z_g|| + gamma ||r|| gcol_g  (triangle +
            # per-column witness error bound aggregated in l2)
            gmargin = alpha * gamma * r_norm * gcol
            w = self._gweights(z.dtype)
            gdiscard = gn + gmargin + radius * gcol < self.lam1 * w
            discard = jnp.repeat(gdiscard, z.shape[0] // self.ngroups)
        else:
            raise ValueError(f"unknown penalty kind {self.kind!r}")
        return ~discard


def l1(lam1) -> Penalty:
    """Lasso penalty lam1*||x||_1 (elastic net = this + Problem.lam2 > 0)."""
    return Penalty(lam1=lam1, kind="l1")


def nonneg_l1(lam1) -> Penalty:
    """Nonnegative lasso penalty: lam1*||x||_1 restricted to x >= 0."""
    return Penalty(lam1=lam1, kind="nonneg_l1")


def group_l2(lam1, ngroups: int, weights: Optional[jax.Array] = None) -> Penalty:
    """Group lasso: lam1 * sum_g w_g ||x_g||_2 over contiguous equal groups."""
    if ngroups <= 0:
        raise ValueError("group_l2 requires ngroups > 0")
    return Penalty(lam1=lam1, kind="group_l2", ngroups=ngroups, weights=weights)
