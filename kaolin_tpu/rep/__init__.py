from kaolin_tpu.rep.surface_mesh import SurfaceMesh  # noqa: F401
