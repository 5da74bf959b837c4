from dumbo_spark.functions.numeric import dmoney, dsum, sql_dmoney, sql_dsum
from dumbo_spark.functions.text import TOKEN_RE, ngrams, tokens

__all__ = ["dmoney", "dsum", "sql_dmoney", "sql_dsum", "TOKEN_RE", "ngrams", "tokens"]
