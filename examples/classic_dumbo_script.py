"""A classic dumbo program, ported by changing ONE import line.

dumbo original (examples/wordcount.py, launched with
``dumbo start wordcount.py -input in.txt -output out -hadoop H``)::

    def mapper(key, value):
        for word in value.split():
            yield word, 1
    if __name__ == "__main__":
        import dumbo
        dumbo.run(mapper, dumbo.lib.sumreducer, combiner=dumbo.lib.sumreducer)

Engine version (launched ``python classic_dumbo_script.py -input
in.txt -output out``) — mapper unchanged, sumreducer inlined:
"""


def mapper(key, value):
    for word in value.split():
        yield word, 1.0


def sumreducer(key, values):
    yield key, float(sum(values))


if __name__ == "__main__":
    from dumbo_spark.compat import run

    run(mapper, sumreducer, combiner=sumreducer,
        output_schema="word string, cnt double")
