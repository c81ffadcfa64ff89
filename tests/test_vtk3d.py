import os

import numpy as np

from ibx.geometry import Mesh
from ibx.io import export_mesh_vtk, write_vtp


def test_vtr_3d_export(tmp_path):
    msh = Mesh(
        origin=np.zeros(3, np.float32), widths=np.ones(3, np.float32),
        block_size=2,
        block_origins=np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]], np.float32),
        block_widths=np.full((2, 3), 0.5, np.float32),
        distance_fields={},
    )
    u = np.arange(16, dtype=np.float32)
    folder = str(tmp_path / "vol3d")
    export_mesh_vtk(folder, msh, u=u)
    assert os.path.isfile(os.path.join(folder, "VOLUME.vtm"))
    data = open(os.path.join(folder, "block_0.vtr")).read()
    assert 'WholeExtent="0 2 0 2 0 2"' in data
    assert "CellData" in data


def test_vtp_triangles(tmp_path):
    pts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    simp = np.array([[0, 1, 2]], np.int64)
    path = str(tmp_path / "tri.vtp")
    write_vtp(path, pts, simp, {"q": np.array([1.0], np.float32)})
    data = open(path).read()
    assert "NumberOfPolys=\"1\"" in data
