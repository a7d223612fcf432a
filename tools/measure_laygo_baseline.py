#!/usr/bin/env python3
"""Measure the reference (laygo) side of the baseline-chain benchmark.

The reference needs Python >= 3.12 (PEP 695 generic syntax); this
container ships 3.11. This harness makes a THROWAWAY copy of the
reference under /tmp and strips the 3.12-only *syntax* (type-parameter
brackets and `type` aliases carry no runtime behavior; annotations are
deferred via `from __future__ import annotations`), leaving every line
of executable logic untouched, then times the reference's own
performance_test.py pipeline shape — 1M/10M integers through
filter(even) -> map(*2) -> filter(>100) -> map(+1) -> to_list() —
through laygo's Pipeline with its own chunked executor.

The Spark twin is `sbt "runMain graft.BaselineChain"` (same chain, sum
consume, median-of-10). Both report rows_out so chain equivalence is
checked, not assumed.

Nothing from the reference is copied into the graft source tree; the
patched copy lives and dies in /tmp.
"""
import re
import sys
import time
import shutil
import pathlib
import inspect
import statistics

REF = pathlib.Path("/root/reference/laygo")
WORK = pathlib.Path("/tmp/laygo311_measure")


def patch_copy() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    (WORK).mkdir(parents=True)
    shutil.copytree(REF, WORK / "laygo")
    # minimal loky stand-in: laygo imports it at module scope, but the
    # sequential strategy measured here never touches a process pool
    (WORK / "loky.py").write_text(
        "from concurrent.futures import ProcessPoolExecutor, as_completed\n"
        "def get_reusable_executor(max_workers=None, **kw):\n"
        "    return ProcessPoolExecutor(max_workers=max_workers)\n")
    pat_def = re.compile(r"def (\w+)\[([^\]]*)\]\(")
    pat_cls = re.compile(r"class (\w+)\[([^\]]*)\]([:(])")
    pat_alias = re.compile(r"^(\s*)type (\w+)(\[[^\]]*\])? = .*$", re.M)
    pat_base = re.compile(r"^(\s*class [^\n:]*?)\[[^\[\]]*\]", re.M)
    for p in (WORK / "laygo").rglob("*.py"):
        s = p.read_text()
        names = set()
        for m in list(pat_def.finditer(s)) + list(pat_cls.finditer(s)):
            for piece in m.group(2).split(","):
                n = piece.split(":")[0].strip().lstrip("*")
                if n:
                    names.add(n)
        s = pat_def.sub(r"def \1(", s)
        s = pat_cls.sub(r"class \1\3", s)
        s = pat_alias.sub(r"\1\2 = object", s)
        prev = None
        while prev != s:  # strip Base[T, U] subscripts on class headers
            prev = s
            s = pat_base.sub(r"\1", s)
        header = ["from __future__ import annotations"]
        if names:
            header.append("import typing as _pep695_t")
            header += [f"{n} = _pep695_t.TypeVar({n!r})" for n in sorted(names)]
        lines = s.split("\n")
        i = 0
        if lines and (lines[0].startswith('"""') or lines[0].startswith("'''")):
            q = lines[0][:3]
            if not (len(lines[0].rstrip()) > 3 and lines[0].rstrip().endswith(q)):
                i = 1
                while i < len(lines) and q not in lines[i]:
                    i += 1
            i += 1
        for j, h in enumerate(header):
            lines.insert(i + j, h)
        p.write_text("\n".join(lines))


def measure(n: int, reps: int) -> None:
    sys.path.insert(0, str(WORK))
    import laygo  # noqa: F401
    # formerly-generic classes are subscripted at runtime (Transformer[T, T]())
    for mod in list(sys.modules.values()):
        if mod and getattr(mod, "__name__", "").startswith("laygo"):
            for _, obj in inspect.getmembers(mod, inspect.isclass):
                if obj.__module__.startswith("laygo"):
                    obj.__class_getitem__ = classmethod(lambda cls, item: cls)
    from laygo.pipeline import Pipeline

    def run() -> int:
        p = (Pipeline(range(n))
             .transform(lambda t: t
                        .filter(lambda x: x % 2 == 0)
                        .map(lambda x: x * 2)
                        .filter(lambda x: x > 100)
                        .map(lambda x: x + 1)))
        return len(p.to_list()[0])

    rows = run()  # warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(f"[laygo-chain] rows_in={n} rows_out={rows} reps={reps} "
          f"median_s={med:.4f} rows_per_s={n / med:,.0f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    patch_copy()
    measure(n, reps)
