"""Incremental step DAG — the reference's core loop, re-expressed.

The reference (OWID etl) is a DAG of dataset-producing steps run only
when *dirty*: a step's input checksum (code hash + upstream output
checksums + version) is compared to the checksum stored with its last
output, and clean steps are skipped (etl/steps/__init__.py:419-466,
topo order via graphlib 66-84, DAG loading 131-170). This module keeps
that contract on Spark:

- a ``Step`` is (name, deps, fn(spark, load) -> DataFrame, version);
- ``checksum_input`` = sha256 over sorted(code sha, version, each
  dependency's OUTPUT checksum) — change anything upstream and every
  downstream step reruns; change nothing and a rerun is a no-op;
- outputs are parquet datasets with sidecar metadata
  (sources.files.write_with_meta); the stored ``source_checksum`` is
  written AFTER the data, so a crash mid-step leaves it dirty and it
  reruns — at-least-once work + idempotent overwrite + checksum commit
  = exactly-once effect (the reference's GrapherStep fence,
  etl/steps/__init__.py:793-794);
- the OUTPUT checksum is the content checksum of the produced frame
  (order/partition-independent, ops.diff.table_checksum) — copying a
  dataset keeps it clean, changing its rows dirties dependents
  (the contract pinned by the reference's
  lib/catalog/tests/test_datasets.py:215-241).

Execution of each step's plan is Spark-parallel; steps themselves run
in topological order (like the reference — inter-step parallelism
comes from submitting independent subgraphs as separate jobs).
"""

from __future__ import annotations

import graphlib
import hashlib
import inspect
import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_spark.ops.diff import table_checksum
from etl_spark.sources.files import read_meta, write_with_meta


def _sha(*parts: str) -> str:
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


@dataclass
class Step:
    name: str
    fn: Callable[..., DataFrame]
    deps: Sequence[str] = ()
    version: str = "1"
    keys: Sequence[str] | None = None  # checksum/ordering keys; default all columns
    # private datasets (the reference's `-private://` URI scheme,
    # etl/command.py:337-338): a private step's output must never feed
    # a public step — validated before every run
    is_public: bool = True

    def code_checksum(self) -> str:
        try:
            src = inspect.getsource(self.fn)
        except (OSError, TypeError):  # lambdas from REPL etc.
            src = repr(self.fn)
        return _sha(src)


class Pipeline:
    """A named set of steps writing datasets under ``root``."""

    def __init__(self, spark: SparkSession, root: str, epoch: str = "0"):
        self.spark = spark
        self.root = root
        self.steps: dict[str, Step] = {}
        # global epoch salt (the reference's ETL_EPOCH, etl/config.py:106):
        # bumping it changes every step's input checksum — the
        # full-rebuild knob without touching any code
        self.epoch = epoch

    def step(self, name: str, deps: Sequence[str] = (), version: str = "1", keys=None,
             is_public: bool = True):
        """Decorator: register ``fn(spark, load)`` as a step. ``load``
        is a callable returning a dependency's DataFrame by name."""
        def wrap(fn):
            self.steps[name] = Step(name, fn, deps, version, keys, is_public)
            return fn
        return wrap

    def add(self, step: Step) -> None:
        self.steps[step.name] = step

    # ---------- storage ----------

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def _stored_meta(self, name: str) -> dict:
        try:
            return read_meta(self._path(name))
        except FileNotFoundError:
            return {}

    # ---------- checksums ----------

    def output_checksum(self, name: str) -> str | None:
        return self._stored_meta(name).get("output_checksum")

    def checksum_input(self, step: Step) -> str:
        parts = [
            f"code:{step.code_checksum()}",
            f"version:{step.version}",
            f"epoch:{self.epoch}",
        ]
        for d in sorted(step.deps):
            out = self.output_checksum(d)
            parts.append(f"dep:{d}:{out}")
        return _sha(*sorted(parts))

    def is_dirty(self, step: Step) -> bool:
        meta = self._stored_meta(step.name)
        return meta.get("source_checksum") != self.checksum_input(step)

    # ---------- run ----------

    def topological_order(
        self, only: Sequence[str] | None = None, downstream: bool = False
    ) -> list[str]:
        """Dependency-ordered step names. ``only`` restricts to the
        selection plus its transitive dependencies; ``downstream=True``
        additionally includes everything that depends on the selection
        (the reference's --downstream flag, etl/steps/__init__.py:87-110)."""
        graph = {s.name: set(s.deps) for s in self.steps.values()}
        order = list(graphlib.TopologicalSorter(graph).static_order())
        if only is None:
            return order
        wanted: set[str] = set()
        frontier = list(only)
        if downstream:
            rev: dict[str, set[str]] = {n: set() for n in graph}
            for n, deps in graph.items():
                for d in deps:
                    rev.setdefault(d, set()).add(n)
            seen: set[str] = set()
            down = list(only)
            while down:
                n = down.pop()
                if n not in seen:
                    seen.add(n)
                    down.extend(rev.get(n, ()))
            frontier = list(seen)
        while frontier:  # include transitive deps of the selection
            n = frontier.pop()
            if n not in wanted:
                wanted.add(n)
                frontier.extend(self.steps[n].deps)
        return [n for n in order if n in wanted]

    def validate_private(self) -> None:
        """No public step may depend on a private step — the boundary
        that keeps a private dataset's rows from leaking into public
        outputs (the reference's _validate_private_steps,
        etl/command.py:326-338; private steps themselves may depend on
        anything). Raises ValueError naming every violation."""
        bad = [
            f"public step {s.name!r} depends on private {d!r}"
            for s in self.steps.values() if s.is_public
            for d in s.deps
            if d in self.steps and not self.steps[d].is_public
        ]
        if bad:
            raise ValueError("; ".join(sorted(bad)))

    def run(
        self,
        only: Sequence[str] | None = None,
        force: bool = False,
        downstream: bool = False,
        private: bool = True,
    ) -> dict[str, str]:
        """Run dirty steps in dependency order; returns
        {step: 'ran' | 'skipped'}. Clean steps are skipped entirely
        (their datasets are not even read unless a dependent runs).
        ``private=False`` excludes private steps from the selection
        (the reference's default without --private; public steps are
        unaffected because the validated DAG never routes a public
        step through a private one)."""
        self.validate_private()
        results: dict[str, str] = {}
        for name in self.topological_order(only, downstream=downstream):
            step = self.steps[name]
            if not private and not step.is_public:
                continue
            input_sum = self.checksum_input(step)
            if not force and self._stored_meta(name).get("source_checksum") == input_sum:
                results[name] = "skipped"
                continue
            df = step.fn(self.spark, self.load)
            out_path = self._path(name)
            # data first, checksum last (commit point): sidecar write in
            # write_with_meta happens after the parquet lands
            out_sum = table_checksum(df)
            write_with_meta(
                df, out_path,
                meta={"source_checksum": input_sum, "output_checksum": out_sum,
                      "step": name, "version": step.version,
                      "is_public": step.is_public},
            )
            results[name] = "ran"
        return results

    def watch(
        self,
        paths: Sequence[str],
        interval_s: float = 1.0,
        max_iterations: int | None = None,
        on_run=None,
    ) -> int:
        """The reference's ``--watch`` mode (etl/command.py:137-138,
        mtime polling etl/files.py:190-211): rerun the DAG whenever any
        watched file's mtime changes. Code changes also flow into
        ``checksum_input`` via code_checksum, so only genuinely
        affected steps rerun. ``max_iterations`` bounds the loop for
        tests; returns the number of DAG runs triggered."""
        import time as _time

        def snapshot() -> dict[str, float]:
            out = {}
            for p in paths:
                if os.path.isdir(p):
                    for base, _, files in os.walk(p):
                        for f in files:
                            fp = os.path.join(base, f)
                            out[fp] = os.path.getmtime(fp)
                elif os.path.exists(p):
                    out[p] = os.path.getmtime(p)
            return out

        last = snapshot()
        runs = 0
        self.run()  # initial pass
        runs += 1
        if on_run:
            on_run(runs)
        i = 0
        while max_iterations is None or i < max_iterations:
            i += 1
            _time.sleep(interval_s)
            now = snapshot()
            if now != last:
                last = now
                self.run()
                runs += 1
                if on_run:
                    on_run(runs)
        return runs
