"""Trajectory pixel -> GPS -> metric ground-plane conversion.

Mirrors utils/gps_utils.py:7-56: bbox ground-contact points are pushed through the
inverse pixel->GPS homography, a bounding GPS rectangle is measured with the haversine
geodesic (R = 6371 km), and each GPS coordinate is linearly interpolated into meters
inside that rectangle.

Precision note: GPS latitudes/longitudes carry meter-scale information in the 5th-6th
decimal place on top of a ~45-degree base — far beyond float32. This stage therefore
runs in float64 on the host by default (it is a T~6-point, once-per-request
computation; the reference also runs it in host numpy float64). Every function is
backend-generic: pass numpy arrays for the f64 host path (default) or jnp arrays to
stay on device.
"""
from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371.0 * 1000.0


def _xp(arr):
    """Pick numpy or jax.numpy based on the input array type."""
    if type(arr).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def geodesic_distance(point1, point2):
    """Haversine distance in meters between (lat, lon) points (gps_utils.py:7-16)."""
    xp = _xp(point1)
    lat1, lon1 = xp.radians(point1[..., 0]), xp.radians(point1[..., 1])
    lat2, lon2 = xp.radians(point2[..., 0]), xp.radians(point2[..., 1])
    dlat = lat1 - lat2
    dlon = lon1 - lon2
    a = xp.sin(dlat / 2.0) ** 2 + xp.cos(lat2) * xp.cos(lat1) * xp.sin(dlon / 2.0) ** 2
    c = 2.0 * xp.arctan2(xp.sqrt(a), xp.sqrt(1.0 - a))
    return EARTH_RADIUS_M * c


def pixels_to_gps(points_px, inv_homography):
    """Project (T, 2) pixel points through the inverse homography -> (T, 2) GPS."""
    xp = _xp(points_px)
    ones = xp.ones((points_px.shape[0], 1), points_px.dtype)
    h_pts = xp.concatenate([points_px, ones], axis=1)
    proj = h_pts @ inv_homography.T
    return proj[:, :2] / proj[:, 2:3]


def gps_to_meters(gps):
    """Interpolate (T, 2) GPS coords into meters inside their bounding rectangle
    (gps_utils.py:38-56)."""
    xp = _xp(gps)
    tl = xp.min(gps, axis=0)  # (lat_min, lon_min)
    br = xp.max(gps, axis=0)  # (lat_max, lon_max)
    bl = xp.stack([tl[0], br[1]])
    tr = xp.stack([br[0], tl[1]])
    br_meter_lat = geodesic_distance(br, bl)  # extent along latitude
    br_meter_lon = geodesic_distance(br, tr)  # extent along longitude
    lat_diff = br[0] - tl[0]
    lon_diff = br[1] - tl[1]
    lat_diff = xp.where(xp.abs(lat_diff) < 1e-15, 1e-15, lat_diff)
    lon_diff = xp.where(xp.abs(lon_diff) < 1e-15, 1e-15, lon_diff)
    m_lat = (gps[:, 0] - tl[0]) / lat_diff * br_meter_lat
    m_lon = (gps[:, 1] - tl[1]) / lon_diff * br_meter_lon
    return xp.stack([m_lat, m_lon], axis=1)


def trajectory_to_meters(points_px, inv_homography):
    """Pixel ground-contact trajectory (T, 2) -> metric coordinates (T, 2).

    Host callers should pass float64 numpy arrays (see module docstring).
    """
    return gps_to_meters(pixels_to_gps(points_px, inv_homography))
