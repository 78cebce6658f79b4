"""Structure-dumper parity (reference asciidoc_structure_dumper.rb:7-42)."""

from rag_content_spark.sources.asciidoc_structure import (
    dump_structure,
    parse_structure,
)

FIXTURE = """= Doc Title

Intro paragraph
continues here.

== Section One

* first item
* second item

[source,python]
----
print("hi")
----

== Section Two

NOTE: be careful

=== Deep

term:: definition
"""


def test_tree_shape():
    doc = parse_structure(FIXTURE)
    assert doc.title == "Doc Title"
    assert [b.context for b in doc.blocks] == ["paragraph", "section", "section"]
    s1, s2 = doc.blocks[1], doc.blocks[2]
    assert (s1.title, s1.level) == ("Section One", 1)
    assert [b.context for b in s1.blocks] == ["ulist", "listing"]
    assert [li.text for li in s1.blocks[0].blocks] == ["first item", "second item"]
    assert s1.blocks[1].text == 'print("hi")'
    # === nests under Section Two (level 2 > 1)
    assert [b.context for b in s2.blocks] == ["admonition", "section"]
    assert s2.blocks[1].title == "Deep"
    assert s2.blocks[1].blocks[0].context == "dlist"


def test_sibling_section_pops():
    doc = parse_structure("== A\n\ntext a\n\n== B\n\ntext b\n")
    assert [(b.title, b.level) for b in doc.blocks] == [("A", 1), ("B", 1)]
    assert len(doc.blocks[0].blocks) == 1


def test_dump_line_format():
    out = dump_structure(FIXTURE).split("\n")
    # root line: Ruby inspect rendering, fixed attribute order
    assert out[0] == (
        '#<Asciidoctor::Document {context: :document, title: "Doc Title", '
        "level: 0, blocks: 3}>"
    )
    # two-space indent per depth; children follow their parent
    assert out[1].startswith("  #<Asciidoctor::Block {context: :paragraph")
    assert 'text: "Intro paragraph\\ncontinues here."' in out[1]
    sec = [line for line in out if "Section One" in line][0]
    assert sec.startswith("  #<Asciidoctor::Section")
    assert "blocks: 2}>" in sec
    items = [line for line in out if ":list_item" in line]
    assert all(line.startswith("      ") for line in items)
    deep = [line for line in out if '"Deep"' in line][0]
    assert deep.startswith("    #<Asciidoctor::Section")


def test_dump_scalar_renderings():
    # nil title on an image without alt; integers bare; symbols coloned
    out = dump_structure("image::x.png[]\n")
    assert out.split("\n")[1] == (
        "  #<Asciidoctor::Block {context: :image, level: 0, blocks: 0}>"
    )
    out2 = dump_structure('= T\n\npara "quoted"\n')
    assert 'text: "para \\"quoted\\""' in out2
