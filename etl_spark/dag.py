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

    def code_checksum(self) -> str:
        try:
            src = inspect.getsource(self.fn)
        except (OSError, TypeError):  # lambdas from REPL etc.
            src = repr(self.fn)
        return _sha(src)


class Pipeline:
    """A named set of steps writing datasets under ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.steps: dict[str, Step] = {}

    def step(self, name: str, deps: Sequence[str] = (), version: str = "1", keys=None):
        """Decorator: register ``fn(spark, load)`` as a step. ``load``
        is a callable returning a dependency's DataFrame by name."""
        def wrap(fn):
            self.steps[name] = Step(name, fn, deps, version, keys)
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
        parts = [f"code:{step.code_checksum()}", f"version:{step.version}"]
        for d in sorted(step.deps):
            out = self.output_checksum(d)
            parts.append(f"dep:{d}:{out}")
        return _sha(*sorted(parts))

    def is_dirty(self, step: Step) -> bool:
        meta = self._stored_meta(step.name)
        return meta.get("source_checksum") != self.checksum_input(step)

    # ---------- run ----------

    def topological_order(self, only: Sequence[str] | None = None) -> list[str]:
        graph = {s.name: set(s.deps) for s in self.steps.values()}
        order = list(graphlib.TopologicalSorter(graph).static_order())
        if only is None:
            return order
        wanted: set[str] = set()
        frontier = list(only)
        while frontier:  # include transitive deps of the selection
            n = frontier.pop()
            if n not in wanted:
                wanted.add(n)
                frontier.extend(self.steps[n].deps)
        return [n for n in order if n in wanted]

    def run(self, only: Sequence[str] | None = None, force: bool = False) -> dict[str, str]:
        """Run dirty steps in dependency order; returns
        {step: 'ran' | 'skipped'}. Clean steps are skipped entirely
        (their datasets are not even read unless a dependent runs)."""
        results: dict[str, str] = {}
        for name in self.topological_order(only):
            step = self.steps[name]
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
                      "step": name, "version": step.version},
            )
            results[name] = "ran"
        return results
