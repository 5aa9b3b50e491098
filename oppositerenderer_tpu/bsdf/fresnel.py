"""Fresnel terms (reference ``renderer/reflection.h:48-174``, pbrt-derived).

Branchless batched re-derivation: the reference's FresnelNoOp/FresnelDielectric
class dispatch becomes a boolean ``use_dielectric`` blend.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import Array


def fresnel_dielectric(cos_i: Array, eta_i: Array, eta_t: Array) -> Array:
    """Exact dielectric Fresnel reflectance.

    ``cos_i`` is the signed cosine against the surface normal; negative means
    the ray exits the medium, in which case etas swap — matching
    FresnelDielectric::evaluate (reflection.h:137-169). Returns 1 on TIR.
    """
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    tir = sin_t >= 1.0
    aci = jnp.abs(cos_i)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    # floored denominators: masked non-dielectric lanes can carry ior=0
    # (ei=et=0 -> 0/0 NaN) and grazing+TIR-boundary lanes hit 0/0; a NaN
    # here — even discarded by fresnel()'s where — trips the checkify NaN
    # pass and poisons reverse-mode gradients (0 * NaN)
    r_parl = (et * aci - ei * cos_t) / jnp.maximum(
        et * aci + ei * cos_t, 1e-20)
    r_perp = (ei * aci - et * cos_t) / jnp.maximum(
        ei * aci + et * cos_t, 1e-20)
    r = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, r)


def fresnel(cos_i: Array, eta_i: Array, eta_t: Array,
            use_dielectric: Array) -> Array:
    """Blend of FresnelDielectric and FresnelNoOp (always 1)."""
    return jnp.where(use_dielectric,
                     fresnel_dielectric(cos_i, eta_i, eta_t), 1.0)
