"""Property-based fuzzing (hypothesis): the blockifier must be total over
arbitrary byte soup, and the fast regex scanner must be event-equivalent
to the stdlib html.parser fallback on any input.

This is the containment guarantee the 100 TB design rests on: no
document, however mangled, may raise out of the kernel (the Arrow stage
would turn a raised exception into a task failure without the
last-resort catch; the kernel should never get there).
"""

import string

from hypothesis import given, settings, strategies as st

from dragnet_spark.kernels.blocks import BlockifyError, blockify
from dragnet_spark.kernels.htmlparse import parse_html
from dragnet_spark.model import LogisticModel
from dragnet_spark.operators.extract import process_document

TAGS = ['div', 'p', 'h1', 'span', 'a', 'script', 'img', 'table', 'li',
        'blockquote', 'i', 'b']

# fragments that stress the tokenizer: unclosed tags, stray brackets,
# entities, attributes with every quoting style
fragment = st.one_of(
    st.text(alphabet=string.printable, max_size=40),
    st.sampled_from(TAGS).map(lambda t: '<%s>' % t),
    st.sampled_from(TAGS).map(lambda t: '</%s>' % t),
    st.sampled_from(TAGS).map(lambda t: '<%s class="x y" id=z>' % t),
    st.sampled_from(TAGS).map(lambda t: "<%s title='a&amp;b'/>" % t),
    st.sampled_from(['<!-- comment -->', '<!--', '<!DOCTYPE html>',
                     '<?php ?>', '&amp;', '&#65;', '&bogus;', '<',
                     '>', '< notatag', '<a href=">']),
)

soup = st.lists(fragment, max_size=30).map(''.join)


def _tree_dump(node, out):
    out.append((node.tag, tuple(sorted(node.attrs.items())), node.text,
                node.tail))
    for c in node.children:
        out.append('(')
        _tree_dump(c, out)
        out.append(')')


@settings(max_examples=300, deadline=None)
@given(soup)
def test_fast_scanner_matches_stdlib_parser(html):
    def dump(fast):
        try:
            root = parse_html(html, fast=fast)
        except BlockifyError:
            return 'BlockifyError'
        out = []
        _tree_dump(root, out)
        return out
    assert dump(True) == dump(False)


@settings(max_examples=300, deadline=None)
@given(soup)
def test_blockify_total(html):
    try:
        blocks = blockify(html)
    except BlockifyError:
        return
    for b in blocks:
        assert b.text
        assert b.link_density >= 0.0
        assert b.text_density >= 0.0
        assert isinstance(b.features.get('tagcount'), int)


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(['text', 'media', 'video', None]),
              st.one_of(st.none(), soup),
              st.one_of(st.none(), st.text(max_size=10)),
              st.one_of(st.none(), st.integers(-5, 50))),
    max_size=8))
def test_process_document_total(raw_spans):
    """Any span soup -> a status row, never an exception; non-text spans
    always reappear in order."""
    model = LogisticModel([0, 0, -10.0, 0, 0, 0, 0, 0, 0], 5.0)
    spans = [{'kind': k, 'text': t, 'media_ref': m, 'offset': o}
             for k, t, m, o in raw_spans]
    out_spans, content, status = process_document(spans, model)
    assert status in ('ok', 'blockify_error', 'too_few_blocks')
    assert [s['offset'] for s in out_spans] == list(range(len(out_spans)))
    in_media = [(s['kind'] or 'text', s['media_ref'] or '')
                for s in spans
                if (s['kind'] or 'text') != 'text']
    if status != 'blockify_error':
        out_media = [(s['kind'], s['media_ref']) for s in out_spans
                     if s['kind'] != 'text']
        # media passthrough ordered by (sanitized) offset
        assert sorted(out_media) == sorted(in_media)
