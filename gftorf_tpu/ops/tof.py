"""Continuous-wave time-of-flight phasor math.

A C-ToF camera measures, per pixel, a complex phasor whose phase encodes
round-trip distance modulo the unambiguous range and whose magnitude is
the reflected amplitude with inverse-square falloff. The rasterizer
composites 7 channels per Gaussian (forward.cu:361-407):

    phase  = dist_to_light * (4*pi / depth_range) + phase_offset
             (+ view-dependent phase from SH, optional)
    factor = 1 / dist_to_light^2
    [cos(p)*A*f, sin(p)*A*f, A*f,
     (cos(p)+dc)*A*f, (-cos(p)+dc)*A*f, (sin(p)+dc)*A*f, (-sin(p)+dc)*A*f]

channels 3..6 are the 4 raw quadrature samples with DC offset.

``depth_from_tof`` inverts the compositing result back to depth via
atan2 (scene/torf_utils.py:53-64).
"""

from __future__ import annotations

import jax.numpy as jnp

TOF_PHASOR_CHANNELS = 7  # real, imag, amp, quad cos, -cos, sin, -sin
TOF_CW_CHANNELS = 2  # (phase, amplitude) from SH


def dist_to_phase_scale(depth_range) -> jnp.ndarray:
    """Phase per unit distance: 4*pi/depth_range (forward.cu:752).

    depth_range is c/f = twice the unambiguous range, and the factor 4pi
    (not 2pi) accounts for the round trip.
    """
    return 4.0 * jnp.pi / depth_range


def phasor_channels(
    dist_to_light: jnp.ndarray,
    phase_sh: jnp.ndarray,
    amplitude: jnp.ndarray,
    depth_range,
    phase_offset,
    dc_offset,
    use_view_dependent_phase: bool,
) -> jnp.ndarray:
    """Per-Gaussian 7-channel ToF phasor features (forward.cu:389-407).

    Args:
        dist_to_light: (...,) distance from Gaussian to the (co-located)
            light/sensor.
        phase_sh: (...,) view-dependent phase from SH (DC removed).
        amplitude: (...,) non-negative amplitude from SH.
        depth_range / phase_offset / dc_offset: scalars.
        use_view_dependent_phase: static bool.

    Returns:
        (..., 7) phasor features, already multiplied by 1/d^2 falloff.
    """
    phase = dist_to_light * dist_to_phase_scale(depth_range) + phase_offset
    if use_view_dependent_phase:
        phase = phase + phase_sh
    factor = 1.0 / (dist_to_light * dist_to_light)
    af = amplitude * factor
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    return jnp.stack(
        [
            c * af,
            s * af,
            af * jnp.ones_like(c),
            (c + dc_offset) * af,
            (-c + dc_offset) * af,
            (s + dc_offset) * af,
            (-s + dc_offset) * af,
        ],
        axis=-1,
    )


def depth_from_tof(tof, depth_range, phase_offset=0.0):
    """Recover depth from a composited phasor image.

    Args:
        tof: (..., C>=2) phasor with real/imag in channels 0/1
            (channel-last; callers with channel-first should move axes).
        depth_range, phase_offset: scalars.

    Returns:
        (...,) depth in scene units. Mirrors torf_utils.py:53-64 including
        the 2*pi wrap of negative phases.
    """
    tof = jnp.asarray(tof)
    # Guard tiny real parts like depth_from_tof_torch (torf_utils.py:59-64).
    real = jnp.where(jnp.abs(tof[..., 0]) < 1e-6, 1e-6, tof[..., 0])
    phase = jnp.arctan2(tof[..., 1], real) - phase_offset
    phase = jnp.where(phase < 0.0, phase + 2.0 * jnp.pi, phase)
    return (phase / (4.0 * jnp.pi)) * depth_range


def tof_from_depth(depth, amp, depth_range, phase_offset=0.0):
    """Synthesize a (..., 3) real/imag/amp phasor image from depth+amplitude
    (torf_utils.py:66-69)."""
    phase = depth * (4.0 * jnp.pi / depth_range) + phase_offset
    return jnp.stack(
        [amp * jnp.cos(phase), amp * jnp.sin(phase), jnp.asarray(amp) * jnp.ones_like(phase)],
        axis=-1,
    )
