"""Lazy ``<CODE>`` pointer codec + hydration (reference C10 / D1–D3).

The reference stores a symbol's body as a lazy pointer
``<CODE>{"S":start,"E":end,"F":file}</CODE>`` (myClient.py:46-48) and
expands it at query-result render time by re-reading the file, slicing
lines [S-1:E], dedenting to the first line's indent, and folding long
snippets (graphDB.py:208-257).

Spark-first equivalent: the pointer is a typed struct column; hydration is
a JOIN against the (broadcast) files table plus pure array/string
expressions — no per-row file I/O, no Python. At 100 TB the files table is
the corpus itself; the join is hash-partitioned on file path and touches
only rows the query projected (column pruning keeps the pointer cheap when
code isn't requested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FOLD_MARKER = "...(code folded)"


def encode_code_pointer(code_file: Column, code_start: Column, code_end: Column) -> Column:
    """Serialize the pointer to the reference's wire format
    ``<CODE>{"S":s,"E":e,"F":f}</CODE>`` (myClient.py:46-48)."""
    return F.concat(
        F.lit("<CODE>"),
        F.to_json(
            F.struct(
                code_start.alias("S"),
                code_end.alias("E"),
                code_file.alias("F"),
            )
        ),
        F.lit("</CODE>"),
    )


def decode_code_pointer(ptr: Column) -> Column:
    """Parse the wire format back to a struct (graphDB.py:236-247)."""
    body = F.regexp_extract(ptr, r"<CODE>(\{.*?\})</CODE>", 1)
    return F.from_json(body, "S INT, E INT, F STRING")


def slice_dedent(content: Column, start: Column, end: Column) -> Column:
    """Lines [start-1:end] of ``content``, dedented to the first line's
    indent, re-joined with newlines (graphDB.py:208-226: the slice/dedent
    primitive). Pure array expressions — stays in codegen."""
    lines = F.slice(F.split(content, "\n"), start, end - start + 1)
    indent = F.regexp_extract(F.element_at(lines, 1), r"^(\s*)", 1)
    dedented = F.transform(
        lines,
        lambda ln: F.regexp_replace(ln, F.concat(F.lit("^"), indent), F.lit("")),
    )
    return F.array_join(dedented, "\n")


def fold_code(code: Column, prefix_len: int = 10) -> Column:
    """Fold a long snippet to ``prefix...(code folded)`` (graphDB.py:249-252
    folds every snippet after the first when several appear)."""
    return F.when(
        F.length(code) > prefix_len,
        F.concat(F.substring(code, 1, prefix_len), F.lit(FOLD_MARKER)),
    ).otherwise(code)


def hydrate_code(
    df: DataFrame,
    files: DataFrame,
    out_col: str = "code",
    fold_over: int | None = None,
    small: bool = True,
) -> DataFrame:
    """Expand code pointers on ``df`` (code_file/code_start/code_end columns)
    into source text by joining the files table (path, content).

    The reference re-opens files from disk per record (graphDB.py:208-226);
    here the files table is a DataFrame — ``small=True`` (the default —
    render-time hydration usually joins a handful of result rows against
    a repo-sized table) broadcasts it; pass ``small=False`` when the
    corpus exceeds broadcast limits and the join should hash-partition on
    path instead — and slicing is columnar.
    """
    f = files.select(
        F.col("path").alias("__code_path"), F.col("content").alias("__content")
    )
    if small:
        f = F.broadcast(f)
    joined = df.join(f, df["code_file"] == F.col("__code_path"), "left")
    code = F.when(
        F.col("__content").isNotNull() & df["code_start"].isNotNull(),
        slice_dedent(F.col("__content"), df["code_start"], df["code_end"]),
    )
    if fold_over is not None:
        code = fold_code(code, fold_over)
    return joined.withColumn(out_col, code).drop("__code_path", "__content")
