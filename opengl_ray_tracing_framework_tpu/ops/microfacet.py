"""Microfacet distributions, shadowing terms and Fresnel models.

Pure, branchless jnp reimplementations of the shading math used by the
reference megakernel (src/shaders/fragment_shader_ray_tracing.glsl):

- GTR1 (Berry) / GTR2 (GGX) / anisotropic GTR2     (glsl:431-452)
- Smith-GGX masking, isotropic + anisotropic        (glsl:456-471)
- Schlick and exact dielectric Fresnel              (glsl:475-497)
- Disney metallic/dielectric Fresnel mix            (glsl:501-506)
- luminance + tint helpers                          (glsl:142-145, 410-427)

All functions broadcast over leading batch dimensions and avoid Python
branches so they fuse on the VPU under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323
INV_PI = 1.0 / PI
TWO_PI = 2.0 * PI
INV_TWO_PI = 1.0 / TWO_PI
INV_4_PI = 1.0 / (4.0 * PI)


def sqr(x):
    return x * x


def safe_sqrt(x, eps=1e-12):
    """sqrt with a strictly positive floor: keeps reverse-mode finite at the
    clamp boundary (d sqrt/dx at 0 is inf; inf * clip-grad 0 = NaN)."""
    return jnp.sqrt(jnp.clip(x, eps, None))


def luminance(c):
    """Rec.709 luminance (glsl:142-145). c: (..., 3)."""
    return 0.212671 * c[..., 0] + 0.715160 * c[..., 1] + 0.072169 * c[..., 2]


def calculate_tint(base_color):
    """Hue-preserving tint: baseColor normalized by luminance (glsl:410-416)."""
    lum = luminance(base_color)[..., None]
    return jnp.where(lum > 0.0, base_color / jnp.maximum(lum, 1e-12), 1.0)


def spec_and_sheen_color(base_color, specular_tint, sheen_tint, metallic, eta):
    """Specular F0 color and sheen color (GetSpecColor, glsl:420-427).

    eta is the relative IOR (incident/transmitted) at the interface.
    Returns (spec_col, sheen_col), each (..., 3).
    """
    ctint = calculate_tint(base_color)
    f0 = (1.0 - eta) / (1.0 + eta)
    f0 = sqr(f0)[..., None]
    white = jnp.ones_like(ctint)
    tinted = white + specular_tint[..., None] * (ctint - white)
    spec_col = f0 * tinted
    m = metallic[..., None]
    spec_col = spec_col + m * (base_color - spec_col)
    sheen_col = white + sheen_tint[..., None] * (ctint - white)
    return spec_col, sheen_col


def gtr1(n_dot_h, alpha):
    """Berry distribution, gamma=1 (glsl:431-436). alpha>=1 -> 1/pi.

    alpha is floored at 0.001 like the matching sampler (glsl:718) — the
    reference's evaluator omits the clamp its sampler applies, which both
    mismatches the sampling density and makes log(alpha^2) singular for
    clearcoatGloss=0 materials."""
    alpha = jnp.clip(alpha, 0.001, None)
    a2 = sqr(alpha)
    t = 1.0 + (a2 - 1.0) * sqr(n_dot_h)
    safe_a2 = jnp.clip(jnp.where(a2 >= 1.0, 0.5, a2), 1e-6, None)
    d = (safe_a2 - 1.0) / (PI * jnp.log(safe_a2) * t)
    return jnp.where(alpha >= 1.0, INV_PI, d)


def gtr2(n_dot_h, alpha):
    """GGX / Trowbridge-Reitz distribution (glsl:441-445)."""
    a2 = sqr(alpha)
    t = 1.0 + (a2 - 1.0) * sqr(n_dot_h)
    return a2 / (PI * sqr(t))


def gtr2_aniso(n_dot_h, h_dot_x, h_dot_y, ax, ay):
    """Anisotropic GGX (glsl:447-452)."""
    c = sqr(h_dot_x / ax) + sqr(h_dot_y / ay) + sqr(n_dot_h)
    return 1.0 / (PI * ax * ay * sqr(c) + 1e-20)


def smith_g_ggx(n_dot_v, alpha_g):
    """Smith-GGX masking, isotropic, with the 2*NdotV numerator the
    reference actually uses (glsl:456-460; the 1/(...) return is dead code)."""
    a = sqr(alpha_g)
    b = sqr(n_dot_v)
    return (2.0 * n_dot_v) / (n_dot_v + safe_sqrt(a + b - a * b) + 1e-20)


def smith_g_ggx_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay):
    """Smith-GGX masking, anisotropic (glsl:465-469)."""
    a = v_dot_x * ax
    b = v_dot_y * ay
    c = n_dot_v
    return (2.0 * n_dot_v) / (n_dot_v + safe_sqrt(sqr(a) + sqr(b) + sqr(c)) + 1e-20)


def schlick_fresnel(u):
    """(1-u)^5, clamped (glsl:475-479)."""
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return sqr(sqr(m)) * m


def dielectric_fresnel(cos_theta_i, eta):
    """Exact unpolarized dielectric Fresnel (glsl:483-497).

    eta = n_incident / n_transmitted. Returns 1 on total internal reflection.
    """
    sin2_t = sqr(eta) * (1.0 - sqr(cos_theta_i))
    cos_t = safe_sqrt(1.0 - sin2_t)
    rs = (eta * cos_t - cos_theta_i) / (eta * cos_t + cos_theta_i + 1e-20)
    rp = (eta * cos_theta_i - cos_t) / (eta * cos_theta_i + cos_t + 1e-20)
    f = 0.5 * (sqr(rs) + sqr(rp))
    return jnp.where(sin2_t > 1.0, 1.0, f)


def disney_fresnel(metallic, eta, l_dot_h, v_dot_h):
    """Lerp of exact dielectric and Schlick-metallic Fresnel (glsl:501-506)."""
    fm = schlick_fresnel(l_dot_h)
    fd = dielectric_fresnel(jnp.abs(v_dot_h), eta)
    return fd + metallic * (fm - fd)


def mix(a, b, t):
    """GLSL mix(a, b, t) = a + t*(b-a), broadcasting."""
    return a + t * (b - a)
