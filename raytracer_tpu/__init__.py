"""raytracer_tpu: a TPU-native differentiable Whitted ray tracer in JAX.

Brand-new implementation with the capability set of the reference CPU raytracer
(clayne/CPU-Raytracer): two-level BVH (SBVH bottom / per-frame-rebuilt SAH top) over
instanced triangle meshes + analytic spheres/planes, Blinn-Phong shading with
shadow-casting point/spot/directional lights, mirror reflection and dielectric
refraction with Schlick Fresnel / Beer's law / total internal reflection, Igehy ray
differentials driving mipmapped trilinear/anisotropic/EWA texture filtering, angular-map
sky probes, and an FXAA post pass — re-designed as wavefront kernels over
structure-of-arrays scene buffers, jit-compiled and shardable over TPU meshes, and
end-to-end differentiable.
"""

from . import accel, config, core, ops, render, scene  # noqa: F401
from .config import DEFAULT_CONFIG, RenderConfig  # noqa: F401

__version__ = "0.1.0"
