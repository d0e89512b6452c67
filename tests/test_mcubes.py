import numpy as np

from moco_flow_tpu.ops.mcubes import export_obj, marching_cubes


def sphere_grid(n=48, r=0.6):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return r - np.sqrt(x * x + y * y + z * z), lin


def test_marching_cubes_sphere():
    grid, lin = sphere_grid()
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    assert tris.max() < len(verts)
    # vertices lie on the r=0.6 sphere (grid coords -> world)
    world = verts / (len(lin) - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(radii, 0.6, atol=0.06)


def test_marching_cubes_empty():
    grid = -np.ones((8, 8, 8), np.float32)
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_marching_cubes_watertight_sphere():
    """Every edge of a closed surface is shared by exactly 2 triangles."""
    grid, _ = sphere_grid(24)
    verts, tris = marching_cubes(grid, 0.0)
    from collections import Counter
    edges = Counter()
    for a, b, c in tris:
        for e in [(a, b), (b, c), (c, a)]:
            edges[tuple(sorted(e))] += 1
    counts = set(edges.values())
    assert counts == {2}, f"non-manifold edge counts: {counts}"


def test_export_obj(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    path = str(tmp_path / "m.obj")
    export_obj(verts, tris, path)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"
