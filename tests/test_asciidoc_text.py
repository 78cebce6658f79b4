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


def test_asciidoc_fixture_goldens():
    """Committed goldens derived from the reference Ruby converter's
    rules (asciidoc/ruby_asciidoc/asciidoc_text_converter.rb), verified
    rule-by-rule:

    - doc title '# ' (rb:47); section '#'*level + ' ' (rb:52-57, '=='
      is asciidoctor level 1)
    - ulist '* item' (rb:59-61); olist '1. item' 1-based (rb:63-65);
      dlist 'terms:: desc' with a trailing space for empty desc (rb:76)
    - listing '\\n```lang\\ncontent\\n```\\n', language omitted when
      absent (rb:108-116); literal = decode(content) (rb:27);
      quote '> content' (rb:29); admonition
      '\\n[TYPE]\\n----\\ncontent\\n----' with the trailing newline
      rstripped by decode (rb:102-106,153); image '![alt]' (rb:25)
    - decode table in order with '&amp;' LAST (rb:132-156): '&amp;lt;'
      -> '&lt;' (never '<'), '&#8221;' -> '\"\"' (the reference's
      literal double-double-quote), rstrip of trailing whitespace
    - blocks joined by blank lines (rb:48-49)
    """
    import glob
    import os

    from rag_content_spark.sources.asciidoc_text import asciidoc_to_text

    fixtures = sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "fixtures/asciidoc/*.adoc"))
    )
    assert len(fixtures) == 4
    for f in fixtures:
        with open(f) as fh:
            src = fh.read()
        with open(f[:-5] + ".golden.txt") as fh:
            golden = fh.read()
        assert asciidoc_to_text(src) == golden, f
