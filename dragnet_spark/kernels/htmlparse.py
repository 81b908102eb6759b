"""Pure-Python recovering HTML parser producing a minimal DOM.

Stand-in for ``lxml.etree.HTMLParser(recover=True, remove_comments=True,
remove_pis=True)`` as used by the reference blockifier
(``/root/reference/dragnet/blocks.pyx:845-847``).  The container ships no
lxml, so we re-derive the subset of libxml2 recovery semantics that the
reference's own unit vectors pin down
(``/root/reference/test/test_kohlschuetter.py``,
``/root/reference/test/test_blocks.py``):

* tag names lowercased; character/entity references decoded
* comments and processing instructions dropped
* fragments wrapped in ``html`` -> ``body`` (no ``head`` synthesized unless
  head-only tags appear -- the reference tagcount vectors require that no
  extra elements are invented)
* HTML5-ish implied end tags (``<p>`` closed by block-level start tags,
  ``<li>`` by ``<li>``, table-section autoclose, ...)
* void elements never take children
* ``<script>``/``<style>`` bodies kept as raw text of the node (they are
  blacklisted downstream but their *tails* matter)
* unparseable / empty input raises :class:`BlockifyError` like
  ``blocks.pyx:848-852``

Intentional divergence from libxml2 (documented in SURVEY.md §5): invalid
byte sequences are decoded with ``errors='replace'`` at ingest instead of
libxml2's parse-truncation quirk -- Spark strings are always valid UTF-8.

DOM depth is capped at :data:`MAX_DEPTH`; deeper start tags are attached as
childless nodes so the downstream recursive walk is stack-safe on adversarial
100TB-scale web input.
"""

from __future__ import annotations

from html.parser import HTMLParser


class BlockifyError(Exception):
    """Raised when a document cannot be parsed at all.

    Mirrors ``dragnet/blocks.pyx:148-152``.
    """


MAX_DEPTH = 400

#: HTML5 void elements -- may never contain children.
VOID_ELEMENTS = frozenset({
    'area', 'base', 'basefont', 'br', 'col', 'command', 'embed', 'frame',
    'hr', 'img', 'input', 'isindex', 'keygen', 'link', 'meta', 'param',
    'source', 'track', 'wbr',
})

#: start tags that implicitly close an open <p> (HTML5 §8.2.5.4.7).
_P_CLOSERS = frozenset({
    'address', 'article', 'aside', 'blockquote', 'center', 'details',
    'dialog', 'dir', 'div', 'dl', 'fieldset', 'figcaption', 'figure',
    'footer', 'form', 'h1', 'h2', 'h3', 'h4', 'h5', 'h6', 'header',
    'hgroup', 'hr', 'main', 'menu', 'nav', 'ol', 'p', 'pre', 'section',
    'table', 'ul', 'li', 'dd', 'dt',
})

#: AUTOCLOSE[open_tag] = set of start tags that implicitly close it.
AUTOCLOSE = {
    'p': _P_CLOSERS,
    'li': frozenset({'li'}),
    'dt': frozenset({'dt', 'dd'}),
    'dd': frozenset({'dt', 'dd'}),
    'tr': frozenset({'tr', 'thead', 'tbody', 'tfoot'}),
    'td': frozenset({'td', 'th', 'tr', 'thead', 'tbody', 'tfoot'}),
    'th': frozenset({'td', 'th', 'tr', 'thead', 'tbody', 'tfoot'}),
    'thead': frozenset({'tbody', 'tfoot'}),
    'tbody': frozenset({'tbody', 'tfoot'}),
    'tfoot': frozenset({'tbody'}),
    'option': frozenset({'option', 'optgroup'}),
    'optgroup': frozenset({'optgroup'}),
    'colgroup': frozenset({'thead', 'tbody', 'tfoot', 'tr'}),
    'head': frozenset({'body'}),
}

#: tags routed to a synthesized <head> when seen before body content.
_HEAD_ONLY = frozenset({'title', 'base'})


class Node:
    """One DOM element: tag, attributes, text, tail, ordered children."""

    __slots__ = ('tag', 'attrs', 'text', 'tail', 'children')

    def __init__(self, tag, attrs=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.text = None
        self.tail = None
        self.children = []

    def __repr__(self):  # pragma: no cover - debug aid
        return '<Node %s children=%d>' % (self.tag, len(self.children))

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node('html')
        self.stack = [self.root]
        self.body = None
        self.head = None
        self.saw_root_tag = False   # explicit <html> seen
        self.saw_markup = False     # any explicit start tag
        self.saw_text = False       # any non-whitespace text

    # -- helpers ---------------------------------------------------------
    def _ensure_body(self):
        if self.body is None:
            self.body = Node('body')
            self.root.children.append(self.body)
            # body lives directly under root on the stack
            self.stack = [self.root, self.body]
        return self.body

    def _ensure_head(self):
        if self.head is None:
            self.head = Node('head')
            self.root.children.append(self.head)
        return self.head

    def _cur(self):
        return self.stack[-1]

    def _append_text(self, node, data):
        if node.children:
            last = node.children[-1]
            last.tail = (last.tail or '') + data
        else:
            node.text = (node.text or '') + data

    def _autoclose_for(self, tag):
        while len(self.stack) > 1:
            closers = AUTOCLOSE.get(self.stack[-1].tag)
            if closers is not None and tag in closers:
                self.stack.pop()
            else:
                break

    # -- HTMLParser callbacks --------------------------------------------
    def handle_starttag(self, tag, attrs):
        self.saw_markup = True
        if tag == 'html':
            # merge into the synthesized root
            self.saw_root_tag = True
            for k, v in attrs:
                self.root.attrs.setdefault(k, v if v is not None else '')
            return
        if self._cur() is self.root and self.body is None:
            if tag == 'head':
                self.head = Node('head', _attr_dict(attrs))
                self.root.children.append(self.head)
                self.stack.append(self.head)
                return
            if tag == 'body':
                self.body = Node('body', _attr_dict(attrs))
                self.root.children.append(self.body)
                self.stack.append(self.body)
                return
            if tag in _HEAD_ONLY or (tag in ('meta', 'link') and self.head is not None):
                head = self._ensure_head()
                node = Node(tag, _attr_dict(attrs))
                head.children.append(node)
                if tag not in VOID_ELEMENTS:
                    # title: capture its text without tracking a full stack
                    self.stack.append(node)
                return
            self._ensure_body()
        elif tag == 'body' and self.body is not None:
            # stray duplicate <body>: ignore the tag itself
            return

        self._autoclose_for(tag)
        node = Node(tag, _attr_dict(attrs))
        self._cur().children.append(node)
        if tag not in VOID_ELEMENTS and len(self.stack) < MAX_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if tag in VOID_ELEMENTS:
            self.handle_starttag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in ('html', 'body') and tag != self._cur().tag:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored (recover=True)

    def handle_data(self, data):
        if not data:
            return
        cur = self._cur()
        if cur is self.root and self.body is None:
            if not data.strip():
                return  # whitespace between <html> and <body> is dropped
            cur = self._ensure_body()
        elif cur is self.head:
            if not data.strip():
                return
        stripped = data.strip()
        if stripped and not stripped.startswith(('<', '!', '?')):
            # '<' / '!' / '?' - leading chunks are malformed-markup residue
            # (e.g. an unterminated comment emitted as data), which libxml2
            # treats as no document; only matters when the doc has no tags
            self.saw_text = True
        self._append_text(cur, data)

    def handle_comment(self, data):  # remove_comments=True
        pass

    def handle_decl(self, decl):  # doctype
        pass

    def handle_pi(self, data):  # remove_pis=True
        pass

    def unknown_decl(self, data):
        pass


def _attr_dict(attrs):
    d = {}
    for k, v in attrs:
        if k not in d:
            d[k] = v if v is not None else ''
    return d


import re as _re
from html import unescape as _unescape

# -- fast regex scanner --------------------------------------------------
# One compiled-regex pass emitting the same event stream html.parser
# produces, dispatched into the same _TreeBuilder -- tree semantics
# (autoclose, head/body synthesis, error detection) are shared, only the
# tokenizer differs.  html.parser's char-by-char goahead() is ~40% of
# per-document cost; this scanner is the hot path, html.parser stays as
# the reference fallback (parse_html(..., fast=False)) and the full
# parity suite pins their equivalence.

_SCAN = _re.compile(r'''
    <!--(?P<comment>.*?)(?:-->|\Z)
  | <!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|\Z)
  | <!(?P<decl>[^>]*)>?
  | <\?(?P<pi>[^>]*)>?
  | </\s*(?P<endtag>[a-zA-Z][a-zA-Z0-9:_.-]*)[^>]*(?:>|\Z)
  | <(?P<starttag>[a-zA-Z][a-zA-Z0-9:_.-]*)
      (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)
      (?:>|\Z)
  | (?P<text>[^<]+)
  | (?P<lt><)
''', _re.DOTALL | _re.VERBOSE)

_ATTR = _re.compile(
    r'([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|\'[^\']*\'|[^\s]*))?')

_RAW_END = {
    'script': _re.compile(r'</script', _re.IGNORECASE),
    'style': _re.compile(r'</style', _re.IGNORECASE),
}

_HAS_ENTITY = _re.compile(r'&')


def _maybe_unescape(s):
    return _unescape(s) if '&' in s else s


def _parse_attrs(raw):
    if not raw or raw.isspace():
        return [], False
    self_closing = raw.rstrip().endswith('/')
    if self_closing:
        raw = raw.rstrip()[:-1]
    attrs = []
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = ''
        elif val[:1] in ('"', "'"):
            val = val[1:-1]
        attrs.append((name, _maybe_unescape(val)))
    return attrs, self_closing


def _scan_into(builder, text):
    pos = 0
    n = len(text)
    while pos < n:
        m = _SCAN.match(text, pos)
        if m is None:  # pragma: no cover - regex covers all inputs
            builder.handle_data(text[pos])
            pos += 1
            continue
        pos = m.end()
        if m.group('text') is not None:
            builder.handle_data(_maybe_unescape(m.group('text')))
        elif m.group('starttag') is not None:
            tag = m.group('starttag').lower()
            attrs, self_closing = _parse_attrs(m.group('attrs') or '')
            if self_closing:
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
                raw_end = _RAW_END.get(tag)
                if raw_end is not None:
                    # raw-text element: everything up to the close tag is
                    # data (html.parser CDATA mode)
                    em = raw_end.search(text, pos)
                    end = em.start() if em else n
                    if end > pos:
                        builder.handle_data(text[pos:end])
                    pos = end
        elif m.group('endtag') is not None:
            builder.handle_endtag(m.group('endtag').lower())
        elif m.group('lt') is not None:
            builder.handle_data('<')
        # comment / cdata / decl / pi: dropped (remove_comments/remove_pis)


def parse_html(text, fast=True):
    """Parse an HTML string into a :class:`Node` tree rooted at ``html``.

    Raises :class:`BlockifyError` for input that libxml2 would fail on
    (empty document / comment-only document -> ``etree.fromstring`` returns
    None or raises, ``blocks.pyx:848-852``).
    """
    builder = _TreeBuilder()
    try:
        if fast:
            _scan_into(builder, text)
        else:
            builder.feed(text)
            builder.close()
    except Exception as exc:  # parsers are lenient; belt and braces
        raise BlockifyError('Could not blockify HTML: %s' % exc) from exc
    if not builder.saw_markup and not builder.saw_text:
        raise BlockifyError('Could not blockify HTML')
    return builder.root
