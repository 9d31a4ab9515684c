"""Per-page analyses: the DSL applied to crawled pages (SURVEY §2.3).

The reference parses HTML into a DOM and folds selector-matched
elements through aggregators (``Analyzer``,
``directives.rs:577-614``).  Here a page's "DOM" is an
``array<struct>`` column synthesized from the image+caption row (the
graft's page payload, BASELINE.json input_hint): a four-element tree

    html > body > (img[src=…] , p.caption)

built entirely JVM-side (F.array/F.struct/F.concat — codegen, no
Python).  The same tree is built as Python dicts for the interpreter
oracle and the ``test_url`` debugging entry point
(``lib.rs:125-186``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .directives.ast import Directives
from .directives.compiler import compile_rule_set
from .directives.interpreter import eval_rule_set

ELEMENT_FIELDS = "pos int, name string, id string, classes array<string>, attrs map<string,string>, text string, html string, inner_html string, path array<int>"


def _doc_html(image_id: Column, w: Column, h: Column, fmt: Column, caption: Column) -> Column:
    img = F.concat(
        F.lit('<img id="main-image" src="'),
        image_id,
        F.lit('" width="'),
        w.cast("string"),
        F.lit('" height="'),
        h.cast("string"),
        F.lit('" fmt="'),
        fmt,
        F.lit('">'),
    )
    p = F.concat(F.lit('<p class="caption">'), caption, F.lit("</p>"))
    inner_body = F.concat(img, p)
    body = F.concat(F.lit("<body>"), inner_body, F.lit("</body>"))
    html = F.concat(F.lit("<html>"), body, F.lit("</html>"))
    return F.struct(
        img.alias("img"), p.alias("p"), inner_body.alias("inner_body"),
        body.alias("body"), html.alias("html"),
    )


def _el(pos, name, id_, classes, attrs, text, html, inner_html, path) -> Column:
    return F.struct(
        F.lit(pos).alias("pos"),
        F.lit(name).alias("name"),
        (F.lit(id_) if isinstance(id_, (str, type(None))) else id_).cast("string").alias("id"),
        classes.alias("classes"),
        attrs.alias("attrs"),
        text.alias("text"),
        html.alias("html"),
        inner_html.alias("inner_html"),
        F.array(*[F.lit(p) for p in path]).cast("array<int>").alias("path"),
    )


def elements_column(
    image_id: Column, w: Column, h: Column, fmt: Column, caption: Column
) -> Column:
    """The page DOM as an array<struct> column (document order)."""
    d = _doc_html(image_id, w, h, fmt, caption)
    no_classes = F.array().cast("array<string>")
    no_attrs = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    img_attrs = F.map_from_arrays(
        F.array(F.lit("id"), F.lit("src"), F.lit("width"), F.lit("height"), F.lit("fmt")),
        F.array(F.lit("main-image"), image_id, w.cast("string"), h.cast("string"), fmt),
    )
    p_attrs = F.map_from_arrays(F.array(F.lit("class")), F.array(F.lit("caption")))
    return F.array(
        _el(0, "html", None, no_classes, no_attrs, caption, d["html"], d["body"], []),
        _el(1, "body", None, no_classes, no_attrs, caption, d["body"], d["inner_body"], [0]),
        _el(
            2, "img", "main-image", no_classes, img_attrs, F.lit(""), d["img"], F.lit(""),
            [0, 1],
        ),
        _el(3, "p", None, F.array(F.lit("caption")), p_attrs, caption, d["p"], caption, [0, 1]),
    )


def elements_py(image_id: str, w: int, h: int, fmt: str, caption: str) -> list[dict]:
    """Python twin of elements_column (interpreter oracle / test_url)."""
    img = f'<img id="main-image" src="{image_id}" width="{w}" height="{h}" fmt="{fmt}">'
    p = f'<p class="caption">{caption}</p>'
    inner_body = img + p
    body = f"<body>{inner_body}</body>"
    html = f"<html>{body}</html>"
    return [
        dict(pos=0, name="html", id=None, classes=[], attrs={}, text=caption,
             html=html, inner_html=body, path=[]),
        dict(pos=1, name="body", id=None, classes=[], attrs={}, text=caption,
             html=body, inner_html=inner_body, path=[0]),
        dict(pos=2, name="img", id="main-image", classes=[],
             attrs={"id": "main-image", "src": image_id, "width": str(w),
                    "height": str(h), "fmt": fmt},
             text="", html=img, inner_html="", path=[0, 1]),
        dict(pos=3, name="p", id=None, classes=["caption"], attrs={"class": "caption"},
             text=caption, html=p, inner_html=caption, path=[0, 1]),
    ]


class Analyzer:
    """Compiled rule sets, applied either as Spark columns or via the
    Python interpreter (must agree — tests/test_dsl_parity.py)."""

    def __init__(self, directives: Directives):
        self.directives = directives
        self.rule_sets = directives.rule_sets
        self.schema = directives.rules()  # [(name, Ty)]

    def apply(self, df: DataFrame, url: str = "url", elements: str = "elements") -> DataFrame:
        cols = [df[c] for c in df.columns]
        for rs in self.rule_sets:
            for name, col in compile_rule_set(rs, df[elements], df[url]):
                cols.append(col.alias(name))
        return df.select(*cols)

    def analyze_py(self, elements: list[dict], url: str) -> dict:
        out = {}
        for rs in self.rule_sets:
            out.update(eval_rule_set(rs, elements, url))
        return out


def analyses_for_wave(
    results: DataFrame, images: DataFrame, analyzer: Analyzer
) -> DataFrame:
    """Fetch results (200s carry image_id) × corpus → analysis rows.
    The corpus side is the big table; the wave batch is broadcast."""
    pages = results.filter(F.col("image_id").isNotNull()).select(
        "url", "url_hash", "image_id"
    )
    joined = images.join(F.broadcast(pages), "image_id")
    with_dom = joined.select(
        "image_id",
        "url",
        "url_hash",
        elements_column(
            F.col("image_id"), F.col("w"), F.col("h"), F.col("fmt"), F.col("caption")
        ).alias("elements"),
    )
    return analyzer.apply(with_dom).drop("elements")
