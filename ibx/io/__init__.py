from .vtk import export_mesh_vtk, export_vtk, write_vtp, write_vtr

__all__ = ["export_mesh_vtk", "export_vtk", "write_vtp", "write_vtr"]
