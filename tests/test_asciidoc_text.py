"""S6 fallback converter: reference Ruby text-converter output contract
(asciidoc_text_converter.rb)."""

from rag_content_spark.sources.asciidoc_text import (
    asciidoc_entity_decode,
    asciidoc_to_text,
)

ADOC = """= Install Guide
:toc: left
// a comment

First paragraph spans
two lines.

== Getting Started

Some intro text.

* first bullet
* second bullet

. step one
. step two

term一:: description one
term二:: description two

[source,python]
----
print("hi")
----

....
literal &#8594; here
....

NOTE: remember this.

image::diagram.png[An diagram]

=== Deep section

____
quoted words
____
"""


def test_asciidoc_contract():
    out = asciidoc_to_text(ADOC)
    blocks = out.split("\n\n")
    # document title: '# '; '==' section is level 1 -> '# '; '===' -> '##'
    assert blocks[0] == "# Install Guide"
    assert "# Getting Started" in blocks
    assert "## Deep section" in blocks
    # attribute + comment lines dropped
    assert ":toc:" not in out and "a comment" not in out
    # paragraph joined, lists formatted
    assert "First paragraph spans\ntwo lines." in blocks
    assert "* first bullet\n* second bullet" in blocks
    assert "1. step one\n2. step two" in blocks
    assert "term一:: description one\nterm二:: description two" in blocks
    # listing with language fence, literal decoded
    assert '\n```python\nprint("hi")\n```' in out
    assert "literal -> here" in out
    # admonition + image + quote forms
    assert "[NOTE]\n----\nremember this.\n----" in out
    assert "![An diagram]" in out
    assert "> quoted words" in out


def test_entity_decode_table():
    assert asciidoc_entity_decode("a &lt;b&gt; &amp;lt; c") == "a <b> &lt; c"
    assert asciidoc_entity_decode("x &#8594; y &#8592; z") == "x -> y <- z"
    assert asciidoc_entity_decode("q&#8217;s &#8220;w&#8221;") == "q's \"w\"\""
    assert asciidoc_entity_decode("trail   ") == "trail"


def test_convert_asciidoc_uses_contract(spark):
    from rag_content_spark.sources.converters import convert_asciidoc

    df = spark.createDataFrame(
        [("/x/a.adoc", "adoc", "d1", "= Title\n\n== Part\n\n* item")],
        ["file_path", "doc_type", "doc_id", "text"],
    )
    out = convert_asciidoc(df).collect()[0]["text"]
    assert out == "# Title\n\n# Part\n\n* item"
