from .mesh import MeshPlan, make_mesh_plan  # noqa: F401
