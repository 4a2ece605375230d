"""Console entry points (pyproject [project.scripts]).

The benchmark lives at the repo root as bench.py (the driver runs it there);
installed environments reach it through this wrapper.
"""

from __future__ import annotations


def bench_main() -> None:
    import importlib.util
    import pathlib
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    bench = root / "bench.py"
    if bench.exists():
        spec = importlib.util.spec_from_file_location("megaverse_bench", bench)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    else:
        sys.exit("bench.py not found (installed from a wheel? run from a "
                 "source checkout: python bench.py)")
