from .mesh import BLOCK_AXIS, default_mesh, init_distributed, make_mesh, mesh_size
