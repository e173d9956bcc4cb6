from .shaders import (MeshRenderer, nocs_attrs, vertex_normals,
                      transform_verts, normal_from_depth)
from . import native
from . import jax_raster
