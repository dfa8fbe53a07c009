"""Generate fixed ASCII layout files for LayoutFromFile scenarios.

Produces original procedurally-generated layouts in the same text format the
reference consumes (rows joined by ';', 'W'=wood source, 'S'=stone source,
'@'=water). Run: python generate_maps.py
"""

import os

import numpy as np

OUT = os.path.dirname(os.path.abspath(__file__))


def blob(rng, grid, symbol, n_tiles, region):
    """Grow a clumped blob of n_tiles inside region via random walk."""
    H, W = grid.shape
    rs, re, cs, ce = region
    placed = 0
    r = rng.integers(rs, re)
    c = rng.integers(cs, ce)
    tries = 0
    while placed < n_tiles and tries < 20 * n_tiles:
        tries += 1
        if grid[r, c] == ".":
            grid[r, c] = symbol
            placed += 1
        dr, dc = rng.choice([(-1, 0), (1, 0), (0, -1), (0, 1)])
        r = min(max(r + dr, rs), re - 1)
        c = min(max(c + dc, cs), ce - 1)
        if rng.random() < 0.25:  # jump to keep multiple clumps
            r = rng.integers(rs, re)
            c = rng.integers(cs, ce)
    return grid


def water_cross(grid):
    """Quadrant-style water cross with gaps near the edges/center."""
    H, W = grid.shape
    o0, o1 = 0.2, 0.35
    rN = (0.5 + np.arange(H)) / H
    cN = (0.5 + np.arange(W)) / W
    rSeg = ((rN < o0) | (rN > o1)) & ((rN < 1 - o1) | (rN > 1 - o0))
    cSeg = ((cN < o0) | (cN > o1)) & ((cN < 1 - o1) | (cN > 1 - o0))
    grid[rSeg, W // 2] = "@"
    grid[H // 2, cSeg] = "@"
    return grid


def save(grid, name):
    rows = ["".join(row) for row in grid]
    with open(os.path.join(OUT, name), "w") as f:
        f.write(";".join(rows))
    print("wrote", name)


def fresh(h, w):
    return np.full((h, w), ".", dtype="U1")


def main():
    rng = np.random.default_rng(7)

    # quadrant 25x25: water cross; wood top-left/bottom-left, stone top
    g = fresh(25, 25)
    g = water_cross(g)
    g = blob(rng, g, "W", 20, (13, 25, 0, 12))   # wood bottom-left quadrant
    g = blob(rng, g, "S", 20, (0, 12, 13, 25))   # stone top-right quadrant
    save(g, "quadrant_25x25_20each_30clump.txt")

    g = fresh(25, 25)
    g = blob(rng, g, "W", 20, (13, 25, 0, 12))
    g = blob(rng, g, "S", 20, (0, 12, 13, 25))
    save(g, "quadrant_25x25_20each_30clump_no_water.txt")

    # uniform 25x25: scattered clumps everywhere
    g = fresh(25, 25)
    for _ in range(5):
        g = blob(rng, g, "W", 5, (0, 25, 0, 25))
        g = blob(rng, g, "S", 5, (0, 25, 0, 25))
    save(g, "uniform_25x25_25each_65clump.txt")

    # small 8x8 quadrant for tests
    g = fresh(8, 8)
    g[3, 2:6] = "@"
    g = blob(rng, g, "W", 4, (5, 8, 0, 4))
    g = blob(rng, g, "S", 4, (0, 3, 5, 8))
    save(g, "quadrant_8x8_4each_8clump.txt")

    # top wood / bottom stone 14x14 (for SplitLayout)
    g = fresh(14, 14)
    g = blob(rng, g, "W", 12, (0, 6, 0, 14))
    g = blob(rng, g, "S", 12, (8, 14, 0, 14))
    save(g, "top_wood_bottom_stone_14x14.txt")

    # pure and mixed 25x25: pure wood zone, pure stone zone, mixed center
    g = fresh(25, 25)
    g = blob(rng, g, "W", 15, (0, 8, 0, 8))
    g = blob(rng, g, "S", 15, (17, 25, 17, 25))
    g = blob(rng, g, "W", 6, (9, 16, 9, 16))
    g = blob(rng, g, "S", 6, (9, 16, 9, 16))
    save(g, "env-pure_and_mixed-25x25.txt")


if __name__ == "__main__":
    main()
