"""Maze library tests (counterpart of src/test/maze_tests.cpp, extended to
every shape x spanning-tree algorithm: a generated maze must be a perfect
maze — the removed borders form a spanning tree, so every pair of cells is
connected by exactly one corridor path)."""

import numpy as np
import pytest

from megaverse_tpu.utils.mazelib import (
    GraphMaze,
    circular_hexagon_maze,
    circular_maze,
    hexagonal_maze,
    honeycomb_maze,
    rectangular_maze,
    user_maze,
)

SHAPES = {
    "rectangular": lambda: rectangular_maze(7, 5),
    "honeycomb": lambda: honeycomb_maze(4),
    "circular": lambda: circular_maze(4),
    "hexagonal": lambda: hexagonal_maze(3),
    "circularhexagon": lambda: circular_hexagon_maze(3),
}
ALGORITHMS = ["kruskal", "dfs", "bfs", "prim", "lerw"]


def _components(maze: GraphMaze) -> int:
    n = len(maze.centers)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for k, (i, j, _) in enumerate(maze.interior):
        if maze.removed[k]:
            parent[find(i)] = find(j)
    return len({find(i) for i in range(n)})


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("algorithm", ALGORITHMS)
def test_spanning_tree(shape, algorithm):
    maze = SHAPES[shape]()
    maze.generate(np.random.default_rng(3), algorithm)
    n = len(maze.centers)
    # exactly n-1 removed borders forming one connected component = a tree
    assert int(maze.removed.sum()) == n - 1
    assert _components(maze) == 1


def test_cell_counts_match_reference():
    # hexagonalmaze.cpp: Maze(6 * size * size)
    assert len(hexagonal_maze(3).centers) == 6 * 9
    # honeycomb size s: 1 + 3s(s-1) cells
    assert len(honeycomb_maze(4).centers) == 1 + 3 * 4 * 3
    # circular-hexagon ring r holds 6*(2r+1) cells
    assert len(circular_hexagon_maze(3).centers) == 6 * (1 + 3 + 5)


def test_generation_seed_deterministic():
    a = honeycomb_maze(4).generate(np.random.default_rng(11), "kruskal")
    b = honeycomb_maze(4).generate(np.random.default_rng(11), "kruskal")
    assert np.array_equal(a.removed, b.removed)
    c = honeycomb_maze(4).generate(np.random.default_rng(12), "kruskal")
    assert not np.array_equal(a.removed, c.removed)


def test_user_maze():
    # 2x2 cycle of cells: spanning tree keeps exactly one wall
    centers = [(0, 0), (1, 0), (1, 1), (0, 1)]
    ring = [(0, 1, (0.5, -0.5, 0.5, 0.5)), (1, 2, (0.5, 0.5, 1.5, 0.5)),
            (2, 3, (0.5, 0.5, 0.5, 1.5)), (3, 0, (-0.5, 0.5, 0.5, 0.5))]
    maze = user_maze(centers, ring).generate(np.random.default_rng(0))
    assert int(maze.removed.sum()) == 3 and _components(maze) == 1


def test_outputs(tmp_path):
    maze = hexagonal_maze(2).generate(np.random.default_rng(0))
    svg = tmp_path / "m.svg"
    plt = tmp_path / "m.plt"
    maze.to_svg(str(svg))
    maze.to_gnuplot(str(plt))
    assert "<svg" in svg.read_text() and "line" in svg.read_text()
    body = plt.read_text()
    assert "set arrow" in body and body.strip().endswith("plot -100 notitle")
