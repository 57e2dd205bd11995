"""Profile the extraction core over the reference fixture corpus.

Two modes:
  python scripts/profile_core.py stages   # per-stage ms/doc (parse_with_timings)
  python scripts/profile_core.py funcs    # cProfile top functions
  python scripts/profile_core.py ab N     # interleaved A/B timing of full parse, N reps

Used to target optimizations; mirrors the reference bench shape
(Sources/SwiftReadabilityBench/main.swift:106-165).
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from swift_readability_spark.core.readability import parse_with_timings, parse

FIXTURES_DIR = Path(
    "/root/reference/Tests/SwiftReadabilityTests/Fixtures/test-pages"
)
BASE_URL = "http://fakehost/test/page.html"


def load_corpus() -> list[tuple[str, str]]:
    docs = []
    for d in sorted(FIXTURES_DIR.iterdir()):
        src = d / "source.html"
        if src.is_file():
            docs.append((d.name, src.read_text(errors="replace")))
    return docs


def run_stages(reps: int = 3) -> None:
    docs = load_corpus()
    total = defaultdict(float)
    n = 0
    t_all0 = time.perf_counter()
    for _ in range(reps):
        for name, html in docs:
            _, t = parse_with_timings(html, BASE_URL)
            for k, v in t.items():
                total[k] += v
            n += 1
    wall = (time.perf_counter() - t_all0) * 1000.0
    print(f"docs x reps = {n}, wall {wall / n:.2f} ms/doc")
    for k, v in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v / n:8.3f} ms/doc")


def run_funcs(reps: int = 2) -> None:
    import cProfile
    import pstats

    docs = load_corpus()

    def work():
        for _ in range(reps):
            for name, html in docs:
                parse(html, BASE_URL)

    pr = cProfile.Profile()
    pr.enable()
    work()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(35)
    st.sort_stats("tottime").print_stats(35)


def run_ab(reps: int = 5) -> None:
    docs = load_corpus()
    best = None
    for r in range(reps):
        t0 = time.perf_counter()
        for name, html in docs:
            parse(html, BASE_URL)
        dt = (time.perf_counter() - t0) * 1000.0 / len(docs)
        best = dt if best is None else min(best, dt)
        print(f"rep {r}: {dt:.2f} ms/doc")
    print(f"best: {best:.2f} ms/doc")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    if mode == "stages":
        run_stages()
    elif mode == "funcs":
        run_funcs()
    elif mode == "ab":
        run_ab(int(sys.argv[2]) if len(sys.argv) > 2 else 5)
