"""Top-level dumbo program API: ``Job``, ``Program``, ``main``.

Reference surface (dumbo/core.py):

- ``Job.additer(mapper, reducer, combiner=..., opts=...)`` (:~420) —
  queue one MapReduce iteration; output of iteration *i* feeds *i+1*
  through temp paths (``<output>_preN``, kept by ``-preoutputs``).
- ``Job.run`` (:~430) — run the chain on the selected backend.
- ``Program``/``main(runner, starter)`` (:~470/~520) — CLI entry that
  re-enters the script driver-side and task-side.

Here an iteration is a DataFrame→DataFrame function, the chain is plain
composition (Catalyst pipelines it — no temp paths, SURVEY §3.4), and
``run`` is lazy until a sink/action. Iterations can be dumbo-style
(mapper/reducer callables, executed through the compat veneer) or
native (any DataFrame transform), mixed freely — that is the intended
migration path: start with classic callables, swap iterations to
native operators one at a time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dumbo_spark.compat.mapred import MapFn, RedFn, map_only, map_reduce


@dataclass
class _Iter:
    mapper: MapFn | None = None
    reducer: RedFn | None = None
    combiner: RedFn | None = None
    output_schema: str = "key string, value double"
    transform: Callable[[DataFrame], DataFrame] | None = None


@dataclass
class Job:
    """A chain of iterations over a single logical dataset.

    >>> job = Job()
    >>> job.additer(mapper, sumreducer, combiner=sumreducer)
    >>> job.additer(remap_mapper, sumreducer)          # itertwice style
    >>> result = job.run(df)                           # lazy DataFrame
    """

    iters: list[_Iter] = field(default_factory=list)

    def additer(
        self,
        mapper: MapFn,
        reducer: RedFn | None = None,
        combiner: RedFn | None = None,
        output_schema: str = "key string, value double",
    ) -> "Job":
        self.iters.append(_Iter(mapper, reducer, combiner, output_schema))
        return self

    def addtransform(self, fn: Callable[[DataFrame], DataFrame]) -> "Job":
        """Native iteration: any DataFrame→DataFrame function. The
        escape hatch dumbo never had — mix freely with additer."""
        self.iters.append(_Iter(transform=fn))
        return self

    def run(self, df: DataFrame) -> DataFrame:
        """Compose the chain. Lazy: Catalyst plans all iterations as one
        query; no intermediate materialization unless you persist()."""
        out = df
        for it in self.iters:
            if it.transform is not None:
                out = it.transform(out)
            elif it.reducer is None:
                out = map_only(out, it.mapper, it.output_schema)
            else:
                out = map_reduce(
                    out,
                    it.mapper,
                    it.reducer,
                    combiner=it.combiner,
                    output_schema=it.output_schema,
                )
        return out


@dataclass
class Program:
    """Driver-side program wrapper (dumbo/core.py Program :~470):
    holds the session, input/output paths and the job; ``start()``
    reads, runs, writes."""

    spark: SparkSession
    input_path: str
    output_path: str | None = None
    job: Job = field(default_factory=Job)

    def addopt(self, key: str, value: Any) -> None:  # dumbo Options shim
        setattr(self, key, value)

    def start(self) -> DataFrame:
        from dumbo_spark.sources import textio

        if self.input_path.endswith((".json", ".jsonl")):
            df = textio.read_jsonl(self.spark, self.input_path)
        elif self.input_path.endswith((".txt", ".text")):
            df = (
                textio.read_text(self.spark, self.input_path)
                .selectExpr("cast(monotonically_increasing_id() as string) as key", "line as value")
            )
        else:
            df = textio.read_parquet(self.spark, self.input_path)
        out = self.job.run(df)
        if self.output_path:
            textio.write_parquet(out, self.output_path)
        return out


def main(
    runner: Callable[[Job], None],
    spark: SparkSession,
    input_path: str,
    output_path: str | None = None,
) -> DataFrame:
    """dumbo.main(runner) equivalent: build the job via the user's
    runner callback, then start the program. No argv re-entry — Spark
    ships closures, so the map/red task-side dispatch (dumbo/core.py
    :~540) has no analogue here."""
    prog = Program(spark, input_path, output_path)
    runner(prog.job)
    return prog.start()
