"""Singular-point-safe gradients for ops the adjoint sweep crosses.

The production step evaluates several functions AT their derivative
singularity on real data every step:

- ``(isr·(1−albedo))^¼`` in `physics/forcing.equilibrium_temp` with
  ``isr == 0`` exactly on the whole night side (the ``maximum(0, cos_z)``
  clamp). Reverse-mode emits ``d/dx x^¼ = ¼·x^(−¾) = inf`` there, and the
  chain-rule product ``inf · 0`` (the zero is ``d numerator/d albedo =
  −isr``) is NaN — which then contaminates every upstream cotangent. This
  was the root cause of the all-NaN adjoint gradients: forward values were
  always finite, so only `jax.grad` users ever saw it.
- ``sqrt(u² + v²)`` wind/current speeds (humidity, boundary-layer fluxes,
  wind stress, ocean outlier caps): singular only when both components are
  exactly zero — rare on real states but guaranteed on synthetic test
  states (calm-start oceans).
- ``chl^p`` with ``p < 1`` in the phytoplankton optics: ``C_phyto`` is
  exactly zero wherever a species is absent, and ``d/dx x^p = p·x^(p−1)``
  is infinite at zero.

Each wrapper's primal is the IDENTICAL expression the production step
always compiled — `jax.custom_jvp` changes only the tangent rule, so
forward HLO, numerics, and every parity/A-B result are untouched. The
tangent at the singular point is the zero subgradient (the standard
convention, e.g. what XLA itself does for ``d|x|`` at 0).

No reference counterpart: the reference (forward-only NumPy) never
differentiates, so it never meets these singularities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def quartic_root(x):
    """x**0.25 with a zero subgradient at x == 0 (instead of +inf)."""
    return x ** 0.25


@quartic_root.defjvp
def _quartic_root_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = x ** 0.25
    # min-normal gate (see _pow_safe_jvp): bounds y/x by tiny^-0.75
    pos = x >= jnp.finfo(jnp.result_type(x)).tiny
    dydx = jnp.where(pos, 0.25 * y / jnp.where(pos, x, 1.0), 0.0)
    return y, dydx * dx


@jax.custom_jvp
def speed(u, v):
    """sqrt(u² + v²) with a zero subgradient at u == v == 0 (not 0/0)."""
    return jnp.sqrt(u * u + v * v)


@speed.defjvp
def _speed_jvp(primals, tangents):
    (u, v), (du, dv) = primals, tangents
    s = jnp.sqrt(u * u + v * v)
    pos = s > 0.0
    ss = jnp.where(pos, s, 1.0)
    # direction cosines u/s, v/s are bounded by 1, so this cannot overflow
    # even at denormal s (1/s would: f32 inf at s < ~3e-39 -> inf*0 = NaN)
    return s, jnp.where(pos, (u / ss) * du + (v / ss) * dv, 0.0 * (du + dv))


@jax.custom_jvp
def pow_safe(x, p):
    """x**p (x ≥ 0) with zero subgradients at x == 0.

    Covers both the d/dx = p·x^(p−1) singularity (p < 1) and the
    d/dp = x^p·log(x) singularity at x == 0.
    """
    return jnp.power(x, p)


@pow_safe.defjvp
def _pow_safe_jvp(primals, tangents):
    (x, p), (dx, dp) = primals, tangents
    y = jnp.power(x, p)
    # gate on the dtype's min normal, not 0: for denormal x, x**(p-1) with
    # p near 0 overflows f32 (x^-1 up to 1e45) -> inf*0 = NaN in the chain;
    # at x >= tiny it is bounded by 1/tiny, which every float format holds
    pos = x >= jnp.finfo(jnp.result_type(x)).tiny
    xs = jnp.where(pos, x, 1.0)
    dydx = jnp.where(pos, p * y / xs, 0.0)
    dydp = jnp.where(pos, y * jnp.log(xs), 0.0)
    return y, dydx * dx + dydp * dp
