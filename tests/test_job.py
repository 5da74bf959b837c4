"""Job/Program API tests — the dumbo top-level surface
(dumbo/core.py Job.additer/Job.run, examples/itertwice.py)."""

from __future__ import annotations

import os
import tempfile

from dumbo_spark.compat.job import Job, Program


def test_job_two_iterations_itertwice(spark):
    """itertwice: first iteration counts words, second re-keys by count
    and counts words-per-frequency."""

    def runner(job: Job) -> None:
        def tokenize(k, v):
            for w in v.split():
                yield (w, 1.0)

        def sumred(k, vals):
            yield (k, float(sum(vals)))

        def rekey(k, v):
            yield (str(int(v)), 1.0)

        job.additer(tokenize, sumred, combiner=sumred)
        job.additer(rekey, sumred, output_schema="freq string, n_words double")

    df = spark.createDataFrame(
        [("0", "a b a"), ("1", "b c")], "key string, value string"
    )
    job = Job()
    runner(job)
    got = {(r.freq, r.n_words) for r in job.run(df).collect()}
    # a:2, b:2, c:1  ->  freq 2 has 2 words, freq 1 has 1 word
    assert got == {("2", 2.0), ("1", 1.0)}


def test_job_mixed_native_transform(spark):
    """addtransform: native DataFrame iterations mix with classic ones —
    the migration path off the veneer."""
    from pyspark.sql import functions as F

    def tokenize(k, v):
        for w in v.split():
            yield (w, 1.0)

    def sumred(k, vals):
        yield (k, float(sum(vals)))

    job = (
        Job()
        .additer(tokenize, sumred)
        .addtransform(lambda df: df.where(F.col("value") >= 2))
    )
    df = spark.createDataFrame([("0", "x y x")], "key string, value string")
    got = [(r.key, r.value) for r in job.run(df).collect()]
    assert got == [("x", 2.0)]


def test_program_text_input(spark):
    d = tempfile.mkdtemp()
    p = os.path.join(d, "in.txt")
    with open(p, "w") as f:
        f.write("spark beats pipes\npipes were fine\n")

    def tokenize(k, v):
        for w in v.split():
            yield (w, 1.0)

    def sumred(k, vals):
        yield (k, float(sum(vals)))

    prog = Program(spark, input_path=p, output_path=os.path.join(d, "out.parquet"))
    prog.job.additer(tokenize, sumred)
    out = {(r.key, r.value) for r in prog.start().collect()}
    assert ("pipes", 2.0) in out and ("spark", 1.0) in out
    assert os.path.isdir(os.path.join(d, "out.parquet"))
