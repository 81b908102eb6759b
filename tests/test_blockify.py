"""Blockifier parity vectors ported from the reference test suite.

Sources: /root/reference/test/test_kohlschuetter.py (blockifier semantics)
and /root/reference/test/test_blocks.py (tagcount + readability vectors).
These pin the re-derived pure-Python walker to the Cython original.
"""

import re

import pytest

from dragnet_spark.kernels import blocks as B

PAGE_FOR_TESTING = """<html>

<body>
<h1>Inside the h1 tag </h1>
<div id="content">
    <b class="title">First line of the content in bold</b>
    <p id="para">A paragraph with <a class="link" href="link_target.html">a link</a> and some

    additional words.

    <p>Second paragraph

    <blockquote>Insert a block quote here</blockquote>

    <div class="image_css" id="image1"><img src="img.jpg"></div>

    <p>Some more text after the image
    <h2>An h2 tag just for kicks</h2>
    <p>Finally more text at the end of the content
</div>

<div class="begin_comments">
    <div id="comment1">
        <p>This is a comment</p>
        <p>with two paragraphs <a href="spam_link.html">and some comment spam</a>
    </div>
    <div id="comment2">
        <p>Second comment</p>
    </div>
</div>


<div class="footer"><a href="footer_link.html"><img src="footer_image.jpg" alt="image as anchor text"></a>Footer text
</div>

</html>"""

HTML2 = """
    <html><body>
    <div class='content'>1 <i>i</i>
        <p class='meta'>2</p>
        <p>3</p>
        <div id='contact'>4
            <p>5</p>
            <p>6</p>
        </div>
        <div></div>
    </div>
    <h1>7</h1>
    </body></html>
    """


def blockify_plain(s, **kw):
    """reference Blockifier.blockify default: css on, tagcount off."""
    return B.blockify(s, do_tagcount=False, do_css=True, do_readability=False, **kw)


def block_output_tokens(blks, true_tokens):
    assert len(blks) == len(true_tokens)
    for k in range(len(blks)):
        assert re.split(r"\s+", blks[k].text.strip()) == true_tokens[k]


def link_output_tokens(blks, true_tokens):
    assert [b.link_tokens for b in blks] == true_tokens


def css_output_tokens(blks, attrib, true_tokens):
    assert len(blks) == len(true_tokens)
    for k in range(len(blks)):
        assert re.split(r"\s+", blks[k].css[attrib].strip()) == true_tokens[k]


def test_guess_encoding():
    s = b"""<?xml version="1.0" encoding="ISO-8859-1"?>
    <!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN"
      "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">

      <html xmlns="http://www.w3.org/1999/xhtml" xml:lang="fr" lang="fr">
    """
    assert B.guess_encoding(s) == b'ISO-8859-1'
    s = b"""<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"
      "http://www.w3.org/TR/html4/strict.dtd">

      <head>
      <meta http-equiv="content-type" content="text/html; charset=GB2312">
      </head>
    """
    assert B.guess_encoding(s) == b'GB2312'
    assert B.guess_encoding(b"<html>sadfsa</html>", 'asciI') == 'asciI'


class TestBlockifier:
    def test_parse_error(self):
        with pytest.raises(B.BlockifyError):
            blockify_plain("")
        with pytest.raises(B.BlockifyError):
            blockify_plain("<!--")

    def test_very_simple(self):
        s = """<div>some text
                    <script> skip this </script>
                    more text here
               </div>"""
        block_output_tokens(blockify_plain(s),
                            [['some', 'text', 'more', 'text', 'here']])

    def test_very_simple2(self):
        s = """<div>some text <i>in italic</i> and something else
                    <script> <div>skip this</div> </script>
                    <b>bold stuff</b> after the script
               </div>"""
        block_output_tokens(
            blockify_plain(s),
            [['some', 'text', 'in', 'italic', 'and', 'something', 'else',
              'bold', 'stuff', 'after', 'the', 'script']])

    def test_simple_two_blocks(self):
        s = """<h1>A title <i>with italics</i> and other words</h1>
               some text outside the h1
               <div>a div <span class="test"> with a span </span> more </div>"""
        block_output_tokens(
            blockify_plain(s),
            [['A', 'title', 'with', 'italics', 'and', 'other', 'words',
              'some', 'text', 'outside', 'the', 'h1'],
             ['a', 'div', 'with', 'a', 'span', 'more']])

    def test_comment(self):
        s = """<H1>h1 tag word</H1>
               <!-- a comment -->
               orphaned text
               <TABLE><tr><td>table data</td></tr><tr><td>second row</td></tr></TABLE>
               final
               """
        block_output_tokens(
            blockify_plain(s),
            [['h1', 'tag', 'word', 'orphaned', 'text'],
             ['table', 'data', 'second', 'row', 'final']])

    def test_empty_blocks(self):
        s = """<div> .! </div>
                some text
               <h1> in an h1 </h1>
               <p> ! _ </p>
            """
        block_output_tokens(blockify_plain(s),
                            [['.!', 'some', 'text'], ['in', 'an', 'h1']])

    def test_nested_blocks(self):
        s = """initial text
            <div>div <p> with paragraph </p>
            after Paragraph
            <div> nested div <div> and again </div>here</div>
            </div>
            final
            <div> <i> italic </i> before <h1>tag</h1></div>"""
        block_output_tokens(
            blockify_plain(s),
            [['initial', 'text'],
             ['div'],
             ['with', 'paragraph', 'after', 'Paragraph'],
             ['nested', 'div'],
             ['and', 'again', 'here', 'final'],
             ['italic', 'before'],
             ['tag']])

    def test_anchors(self):
        s = """<a href=".">anchor text</a>
               more
               <div>text <a href=".">123</a><div>MORE!</div></div>
               an img link<a href="."><img src="."></a>there
               <table><tr><td><a href=".">WILL <img src="."> THIS PASS <b>THE TEST</b> ??</a></tr></td></table>"""
        blks = blockify_plain(s)
        block_output_tokens(
            blks,
            [['anchor', 'text', 'more'],
             ['text', '123'],
             ['MORE!', 'an', 'img', 'link', 'there'],
             ['WILL', 'THIS', 'PASS', 'THE', 'TEST', '??']])
        link_output_tokens(
            blks,
            [['anchor', 'text'],
             ['123'],
             [],
             ['WILL', 'THIS', 'PASS', 'THE', 'TEST', '??']])

    def test_unicode(self):
        s = u"""<div><div><a href="."> the registered trademark \xae</a></div></div>"""
        blks = blockify_plain(s)
        block_output_tokens(blks, [['the', 'registered', 'trademark', u'\xae']])
        link_output_tokens(blks, [['the', 'registered', 'trademark', u'\xae']])

    def test_all_non_english(self):
        s = u"""<div> <div> δογ </div> <div> <a href="summer">\xe9t\xe9</a> </div>
         <div> 报道一出 </div> </div>"""
        blks = blockify_plain(s)
        block_output_tokens(
            blks,
            [[u'δογ'], [u'\xe9t\xe9'], [u'报道一出']])
        link_output_tokens(blks, [[], [u'\xe9t\xe9'], []])

    def test_class_id(self):
        s = """<div CLASS='d1'>text in div
                <h1 id="HEADER">header</h1>
                <div class="nested">dragnet</div>
                </div>"""
        blks = blockify_plain(s)
        block_output_tokens(blks, [['text', 'in', 'div'], ['header'], ['dragnet']])
        css_output_tokens(blks, 'id', [[''], ['header'], ['']])
        css_output_tokens(blks, 'class', [['d1'], [''], ['nested']])

    def test_class_id_unicode(self):
        s = b"""<div CLASS=' class1 \xc2\xae'>text in div
                <h1 id="HEADER">header</h1>
                </div>"""
        blks = blockify_plain(s, encoding='utf-8')
        block_output_tokens(blks, [['text', 'in', 'div'], ['header']])
        css_output_tokens(blks, 'id', [[''], ['header']])
        css_output_tokens(blks, 'class', [['class1', '\xae'], ['']])

    def test_invalid_bytes(self):
        # Documented divergence from libxml2 (which truncates the parse at
        # invalid text bytes, dropping the <p> block entirely): our decode
        # cascade falls back to iso-8859-1, so \x80 becomes U+0080 -- the
        # same codepoint the reference vector expects for the attr
        # (str_cast(b'\xc2\x80') == '\x80') -- and the <p> block survives.
        s = b"""<div CLASS='\x80'>text in div</div><p>invalid bytes \x80</p>"""
        blks = blockify_plain(s, encoding='utf-8')
        assert blks[0].text == 'text in div'
        assert blks[0].css['class'] == '\x80'
        assert blks[1].text == 'invalid bytes \x80'

    def test_big_html(self):
        blks = blockify_plain(PAGE_FOR_TESTING)
        block_output_tokens(
            blks,
            [['Inside', 'the', 'h1', 'tag'],
             ['First', 'line', 'of', 'the', 'content', 'in', 'bold'],
             ['A', 'paragraph', 'with', 'a', 'link', 'and', 'some',
              'additional', 'words.'],
             ['Second', 'paragraph', 'Insert', 'a', 'block', 'quote', 'here'],
             ['Some', 'more', 'text', 'after', 'the', 'image'],
             ['An', 'h2', 'tag', 'just', 'for', 'kicks'],
             ['Finally', 'more', 'text', 'at', 'the', 'end', 'of', 'the',
              'content'],
             ['This', 'is', 'a', 'comment'],
             ['with', 'two', 'paragraphs', 'and', 'some', 'comment', 'spam'],
             ['Second', 'comment'],
             ['Footer', 'text']])
        link_output_tokens(
            blks,
            [[], [], ['a', 'link'], [], [], [], [], [],
             ['and', 'some', 'comment', 'spam'], [], []])
        css_output_tokens(
            blks, 'class',
            [[''], ['title'], ['link'], [''], [''], [''], [''], [''], [''],
             [''], ['footer']])
        css_output_tokens(
            blks, 'id',
            [[''], ['content'], ['para'], [''], [''], [''], [''], [''], [''],
             [''], ['']])


def check_tagcount(expected, features):
    assert features['tagcount'] == expected[0]
    assert features['tagcount_since_last_block'] == expected[1]
    assert features['anchor_count'] == expected[2]
    assert features['min_depth_since_last_block'] == expected[3]


class TestTagCountPB:
    def test_simple(self):
        s = """<html><body><div>some text <i>in italic</i> and something else
                    <script> <div>skip this</div> </script>
                    <b>bold stuff</b> after the script
               </div></body></html>"""
        blks = B.blockify(s, do_tagcount=True, do_css=True, do_readability=False)
        check_tagcount((3, 2, 0, 0), blks[0].features)
        assert len(blks) == 1

    def test_big_html(self):
        blks = B.blockify(PAGE_FOR_TESTING, do_tagcount=True, do_css=True,
                          do_readability=False)
        actual_features = [
            (1, 2, 0, 0),
            (2, 0, 0, 2),
            (2, 0, 1, 3),
            (2, 0, 0, 3),
            (1, 2, 0, 3),
            (1, 0, 0, 3),
            (1, 0, 0, 3),
            (1, 2, 0, 2),
            (2, 0, 1, 4),
            (1, 1, 0, 3),
            # last block skipped: reference-documented bug in the _tc-1
            # adjustment for the final block (test_blocks.py:107-110)
        ]
        for a, b in zip(actual_features, blks):
            check_tagcount(a, b.features)


class TestReadabilityBlocks:
    def _blockify(self):
        return B.blockify(HTML2, do_tagcount=True, do_css=True,
                          do_readability=True)

    def test_ancestors(self):
        blks = self._blockify()
        actual = [(blk.text, blk.features['ancestors']) for blk in blks]
        expected = [
            ('1 i', [0, 2]),
            ('2', [0, 2, 4]), ('3', [0, 2, 4]), ('4', [0, 2, 4]),
            ('5', [0, 2, 4, 9]), ('6', [0, 2, 4, 9]),
            ('7', [0, 2])]
        assert actual == expected

    def test_class_weights(self):
        blks = self._blockify()
        actual = [blk.features['readability_class_weights'] for blk in blks]
        expected = [
            [(0, 0), (2, 0), (4, 30), (6, 0)], [(7, -25)], [(8, 0)],
            [(9, -20)], [(11, 0)], [(12, 0)], [(13, 5), (14, -5)]]
        assert actual == expected

    def test_block_start_tag(self):
        blks = self._blockify()
        actual = [blk.features['block_start_tag'] for blk in blks]
        assert actual == ['div', 'p', 'p', 'div', 'p', 'p', 'h1']


class TestEncodingRepair:
    """Mojibake (double-encoding) repair, the ftfy.fix_encoding analogue
    the reference applies in its readers (data_processing.py:242,267)."""

    def test_utf8_as_latin1_repaired(self):
        from dragnet_spark.kernels.blocks import fix_mojibake
        orig = 'café déjà-vu – “quotes”'
        assert fix_mojibake(orig.encode('utf-8').decode('latin-1')) == orig

    def test_utf8_as_cp1252_repaired(self):
        from dragnet_spark.kernels.blocks import fix_mojibake
        assert fix_mojibake(
            'naïve'.encode('utf-8').decode('cp1252')) == 'naïve'

    def test_genuine_latin1_untouched(self):
        from dragnet_spark.kernels.blocks import fix_mojibake
        assert fix_mojibake('café au lait') == 'café au lait'
        assert fix_mojibake('plain ascii only') == 'plain ascii only'

    def test_double_encoded_chain_repaired(self):
        # VERDICT r02 #8: two utf-8-as-latin-1 round trips repair
        # iteratively to the original, byte-equal
        from dragnet_spark.kernels.blocks import fix_mojibake
        for orig in ('café déjà-vu – “smart quotes” …',
                     'naïve äöü ß', 'Ça va — très bien'):
            m1 = orig.encode('utf-8').decode('latin-1')
            m2 = m1.encode('utf-8').decode('latin-1')
            assert fix_mojibake(m1) == orig
            assert fix_mojibake(m2) == orig, orig

    def test_entity_mix_mojibake_repaired(self):
        # mojibake whose high bytes got entity-escaped along the way
        from dragnet_spark.kernels.blocks import fix_mojibake
        # '&Atilde;&copy;' == 0xC3 0xA9 == utf-8 'é'
        assert fix_mojibake('caf&Atilde;&copy; time') == 'café time'
        # numeric refs: 'â' 0x80 0x9C == utf-8 left curly quote
        assert fix_mojibake('he said &acirc;&#128;&#156;hi'
                            '&acirc;&#128;&#157;') == 'he said “hi”'
        # literal + entity mix in one string
        assert fix_mojibake('hÃ©llo &Atilde;&copy;!') == 'héllo é!'

    def test_structural_and_clean_entities_untouched(self):
        from dragnet_spark.kernels.blocks import fix_mojibake
        for s in ('&lt;script&gt; if 5 &gt; 3 &amp;&amp; x',
                  'touch&eacute; r&eacute;sum&eacute;',
                  'A&nbsp;B &#8212; C', '&bogusentity; &#12;'):
            assert fix_mojibake(s) == s, s

    def test_decode_html_repairs_lying_meta_charset(self):
        # utf-8 bytes whose meta tag claims iso-8859-1: the cascade decodes
        # as latin-1 (per the sniff), then the mojibake repair recovers it
        from dragnet_spark.kernels.blocks import decode_html
        markup = ('<html><head><meta charset="iso-8859-1"></head>'
                  '<body><p>café</p></body></html>').encode('utf-8')
        assert 'café' in decode_html(markup)

    def test_encoding_matrix(self):
        # the reference's encoding matrix (test/test_data_processing.py:63-81
        # equivalent): same text through ascii/latin-1/utf-8/utf-16 readers
        from dragnet_spark.kernels.blocks import decode_html
        ascii_txt = 'plain words only'
        assert decode_html(ascii_txt.encode('ascii')) == ascii_txt
        uni = 'résumé 中文'
        assert decode_html(uni.encode('utf-8')) == uni
        lat = 'résumé'
        assert decode_html(lat.encode('iso-8859-1'),
                           encoding='iso-8859-1') == lat
        utf16 = ('<?xml version="1.0" encoding="utf-16"?><p>x</p>'
                 .encode('utf-16'))
        assert '<p>x</p>' in decode_html(utf16, encoding='utf-16')


class TestHeadAutoclose:
    """Unterminated <head>: flow content implicitly closes it, matching
    libxml2 recovery (ADVICE r01)."""

    def test_div_closes_unterminated_head(self):
        blocks = B.blockify(
            b'<html><head><div>real content words</div>'
            b'<p>second block text</p>')
        assert [b.text for b in blocks] == ['real content words',
                                            'second block text']

    def test_text_closes_unterminated_head(self):
        blocks = B.blockify(b'<head>loose text here<div>div block</div>')
        assert [b.text for b in blocks] == ['loose text here', 'div block']

    def test_head_content_stays_in_head(self):
        # title/meta/style do NOT close the head; body starts after.
        # title is not blacklisted (reference parity: its text rides the
        # accumulated stream and flushes at the first block tag).
        blocks = B.blockify(
            b'<head><title>t</title><meta charset="utf-8">'
            b'<style>p{}</style><div>body content block</div>')
        assert [b.text for b in blocks] == ['t', 'body content block']

    def test_wellformed_head_unaffected(self):
        blocks = B.blockify(
            b'<html><head><title>t</title></head>'
            b'<body><div>the one block</div></body></html>')
        assert [b.text for b in blocks] == ['t', 'the one block']


class TestEncodingSniffer:
    """chardet-equivalent fallback (guess_encoding default='CHARDET',
    blocks.pyx:790-793)."""

    def test_bom_detection(self):
        from dragnet_spark.kernels.blocks import sniff_encoding_heuristic as s
        assert s('x'.encode('utf-8-sig')) == 'utf-8-sig'
        assert s('hello page'.encode('utf-16')) == 'utf-16'
        assert s('hello page'.encode('utf-32')) == 'utf-32'

    def test_bomless_utf16_null_striping(self):
        from dragnet_spark.kernels.blocks import sniff_encoding_heuristic as s
        txt = '<html><body><p>plain ascii page text</p></body></html>'
        assert s(txt.encode('utf-16-le')[2:]
                 if txt.encode('utf-16-le')[:2] == b'\xff\xfe'
                 else txt.encode('utf-16-le')) in ('utf-16-le', 'utf-16')
        assert s(txt.encode('utf-16-be')) == 'utf-16-be'

    def test_utf8_and_latin_discrimination(self):
        from dragnet_spark.kernels.blocks import sniff_encoding_heuristic as s
        assert s('résumé 中文 body'.encode('utf-8')) == 'utf-8'
        assert s('plain ascii only'.encode()) == 'utf-8'
        assert s('résumé café'.encode('iso-8859-1')) == 'iso-8859-1'
        assert s('quote “x”'.encode('cp1252')) == 'cp1252'

    def test_guess_encoding_chardet_default(self):
        from dragnet_spark.kernels.blocks import guess_encoding
        # meta hint wins over the sniffer
        assert guess_encoding(
            b'<meta charset="iso-8859-1">x', default='CHARDET') == b'iso-8859-1'
        assert guess_encoding(
            'no hints résumé'.encode('utf-8'), default='CHARDET') == 'utf-8'
        # plain default path unchanged
        assert guess_encoding(b'no hints here') == 'utf-8'
