"""Rasterization: spectrum textures -> RGBA frames.

The reference draws through numbered fragment-shader passes per module
(glava/render.c:2011-2345, shaders/glava/<module>/N.frag). Here each
module is a set of jnp pass functions over statically-shaped coordinate
grids — branch-heavy per-pixel GLSL becomes vectorized masked math
(``jnp.where``) on the VPU, with spectrum sampling baked to static
gathers / resample matmuls. Passes chain through a ``prev`` frame
exactly like the reference's FBO ping-ponging.
"""
