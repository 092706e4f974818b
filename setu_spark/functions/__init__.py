from setu_spark.functions.hashes import hash64, hash64_sql  # noqa: F401
from setu_spark.functions.text import (  # noqa: F401
    byte_count,
    char_count,
    digit_ratio,
    is_number,
    split_keep_delimiter,
    symbol_ratio,
    terminal_valid,
    tokenize,
    word_count,
)
