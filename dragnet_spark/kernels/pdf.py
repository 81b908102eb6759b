"""Minimal PDF text + layout kernel (north rule: "PDF/layout parse").

No PDF library ships in this container, so this implements the subset
of PDF (public ISO 32000 spec) that page-oriented text documents
actually use, from scratch:

* :func:`make_pdf` -- deterministic writer: Helvetica text positioned
  with ``Tm``/``Td``, one FlateDecoded content stream per page, correct
  xref table.  It is the test/bench fixture generator AND the living
  specification of the writer-side conventions.
* :func:`extract_text_runs` -- parser: finds ``N 0 obj .. endobj``
  objects linearly (no xref dependence; free entries and xref streams
  are simply skipped), expands PDF 1.5 compressed object streams
  (``/Type /ObjStm``), decodes ``/Filter`` chains (Flate, LZW with
  EarlyChange, ASCIIHex -- ``_decode_stream``; unknown filters skip the
  object, contained), handles ``/Contents`` arrays (streams concatenate
  per ISO 32000 7.8.2), and interprets the text operators
  ``BT ET Tf Td TD Tm T* TL Tj TJ ' "`` into positioned runs
  ``(page, x, y, size, text, page_h)`` -- ``page_h`` from each page's
  /MediaBox (inherited from the /Pages root).  Literal strings handle
  the ``\\`` escapes and octal codes; hex strings are decoded as
  latin-1 (the writer's WinAnsi subset).  Unsupported constructs are
  skipped, never fatal.
* :func:`layout_blocks` -- layout analysis: runs -> lines (shared
  baseline within half the font size) -> blocks (split on vertical gaps
  > 1.8x the dominant leading or font-size changes), top-down reading
  order, ``heading``/``body`` kinds by relative font size.
* :func:`strip_repeated_furniture` -- the layout de-chroming step:
  blocks whose normalized text recurs at the same position on most
  pages (running headers/footers, page numbers ``Page N`` normalized)
  are boilerplate, the PDF analogue of dragnet's DOM chrome.  Both
  strippers zone against each block's own page height, so A4/letter
  mixes de-chrome correctly.

Still out of scope (documented, contained): cross-reference streams as
a *lookup* structure (unnecessary -- the scan is linear), non-text
filters (DCT/JBIG2/CCITT images), CID/composite fonts, encryption.

Scale shape: everything here is a pure per-document kernel -- the Spark
operator (``operators/pdf_extract.py``) maps it over Arrow batches of
``binary`` payloads, exactly like the HTML blockifier.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

PAGE_W = 612
PAGE_H = 792
MARGIN = 72
LEADING = 14
BODY_SIZE = 11
HEAD_SIZE = 18


def _esc(s: str) -> str:
    """PDF string operand: latin-1-safe text as an escaped literal
    string, anything else as a BOM-prefixed UTF-16BE hex string.

    LIMITATION (writer/parser-internal convention): ISO 32000's UTF-16
    text-string form (7.9.2) applies to document-metadata strings, not
    to show-operator operands, which are byte strings in the page
    font's encoding.  A conformant viewer rendering this writer's
    non-latin-1 output (e.g. the zh chrome fixtures) through the
    WinAnsi-encoded Helvetica would show garbage; only this module's
    own parser (``_decode_hex`` honors the BOM) round-trips it.  The
    fixtures exist to exercise the *pipeline* on non-Latin text, not
    to produce viewer-conformant PDFs (ADVICE r03)."""
    try:
        raw = s.encode('latin-1')
    except UnicodeEncodeError:
        return '<FEFF%s>' % s.encode('utf-16-be').hex().upper()
    if raw[:2] == b'\xfe\xff':
        # latin-1 text that HAPPENS to start with the UTF-16BE BOM
        # bytes would be mis-sniffed by _decode_literal (which honors
        # the BOM for third-party writers) -- route it through the
        # BOM'd hex form so the round trip stays exact
        return '<FEFF%s>' % s.encode('utf-16-be').hex().upper()
    return '(%s)' % (s.replace('\\', r'\\')
                     .replace('(', r'\(').replace(')', r'\)'))


def make_pdf(title, paragraphs, header=None, footer=None, wrap=90):
    """Deterministic multi-page PDF: a sized title, wrapped body
    paragraphs, and optional running header/footer + ``Page N`` furniture
    on every page.  Returns bytes."""
    # wrap paragraphs into lines
    lines = []  # (text, size, para_break)
    first = True
    for para in paragraphs:
        words = para.split()
        cur = []
        out_lines = []
        for w in words:
            if cur and len(' '.join(cur + [w])) > wrap:
                out_lines.append(' '.join(cur))
                cur = [w]
            else:
                cur.append(w)
        if cur:
            out_lines.append(' '.join(cur))
        for k, ln in enumerate(out_lines):
            lines.append((ln, BODY_SIZE, first or k == 0))
        first = False

    # paginate by y budget (paragraph breaks consume an extra leading;
    # the first page loses two leadings to the title; nothing may enter
    # the footer zone below y=90)
    pages = []
    cur_page = []
    y = PAGE_H - MARGIN - 2 * LEADING  # title reserve on page 0
    for ln in lines:
        cost = LEADING * (2 if (ln[2] and cur_page) else 1)
        if y - cost < 90:
            pages.append(cur_page)
            cur_page = []
            y = PAGE_H - MARGIN
            cost = LEADING  # no para-gap at top of page
            ln = (ln[0], ln[1], False)
        cur_page.append(ln)
        y -= cost
    pages.append(cur_page)

    def page_stream(pg_idx, pg_lines):
        ops = ['BT']
        y = PAGE_H - MARGIN
        if header:
            ops.append('/F1 9 Tf 1 0 0 1 %d %d Tm %s Tj'
                       % (MARGIN, PAGE_H - 40, _esc(header)))
        if pg_idx == 0:
            ops.append('/F1 %d Tf 1 0 0 1 %d %d Tm %s Tj'
                       % (HEAD_SIZE, MARGIN, y, _esc(title)))
            y -= 2 * LEADING
        ops.append('/F1 %d Tf %d TL 1 0 0 1 %d %d Tm'
                   % (BODY_SIZE, LEADING, MARGIN, y))
        for k, (ln, size, brk) in enumerate(pg_lines):
            if brk and k > 0:
                ops.append('T*')  # paragraph gap: extra blank line
            ops.append('%s Tj T*' % _esc(ln))
        if footer:
            ops.append('/F1 9 Tf 1 0 0 1 %d 36 Tm %s Tj'
                       % (MARGIN, _esc(footer)))
        ops.append('/F1 9 Tf 1 0 0 1 %d 36 Tm (Page %d) Tj'
                   % (PAGE_W - MARGIN - 40, pg_idx + 1))
        ops.append('ET')
        return zlib.compress('\n'.join(ops).encode('latin-1'))

    # objects: 1 catalog, 2 pages-root, 3 font, then per page (page, stream)
    objs = {}
    n_pages = len(pages)
    page_ids = [4 + 2 * k for k in range(n_pages)]
    kids = ' '.join('%d 0 R' % pid for pid in page_ids)
    objs[1] = b'<< /Type /Catalog /Pages 2 0 R >>'
    objs[2] = ('<< /Type /Pages /Kids [%s] /Count %d >>'
               % (kids, n_pages)).encode()
    objs[3] = (b'<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica'
               b' /Encoding /WinAnsiEncoding >>')
    for k, pg in enumerate(pages):
        pid = page_ids[k]
        data = page_stream(k, pg)
        objs[pid] = ('<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] '
                     '/Resources << /Font << /F1 3 0 R >> >> '
                     '/Contents %d 0 R >>'
                     % (PAGE_W, PAGE_H, pid + 1)).encode()
        objs[pid + 1] = (b'<< /Length %d /Filter /FlateDecode >>\nstream\n'
                         % len(data) + data + b'\nendstream')

    out = bytearray(b'%PDF-1.4\n%\xe2\xe3\xcf\xd3\n')
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b'%d 0 obj\n' % num
        out += objs[num]
        out += b'\nendobj\n'
    xref_at = len(out)
    maxobj = max(objs)
    out += b'xref\n0 %d\n' % (maxobj + 1)
    out += b'0000000000 65535 f \n'
    for num in range(1, maxobj + 1):
        out += b'%010d 00000 n \n' % offsets.get(num, 0)
    out += (b'trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n'
            % (maxobj + 1, xref_at))
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb'(\d+)\s+(\d+)\s+obj\b')
_STREAM_OPEN_RE = re.compile(rb'stream\r?\n')
# (?![0-9]) pins the digit boundary: without it, '/Length 15 0 R'
# backtracks \d+ to '1' (the '5 0 R' tail then defeats the indirect-ref
# lookahead) and slices a 1-byte stream instead of falling back to the
# endstream scan (ADVICE r03, medium)
_LENGTH_RE = re.compile(rb'/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)')
_ENDSTREAM_RE = re.compile(rb'\r?\n?endstream')
_CONTENTS_RE = re.compile(rb'/Contents\s+(\d+)\s+\d+\s+R')
_CONTENTS_ARR_RE = re.compile(rb'/Contents\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]')
_REF_RE = re.compile(rb'(\d+)\s+\d+\s+R')
_PAGE_RE = re.compile(rb'/Type\s*/Page\b(?!s)')
_PAGES_RE = re.compile(rb'/Type\s*/Pages\b')
_MEDIABOX_RE = re.compile(
    rb'/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)'
    rb'\s+([\d.+-]+)\s*\]')
_OBJSTM_RE = re.compile(rb'/Type\s*/ObjStm\b')
_OBJSTM_N_RE = re.compile(rb'/N\s+(\d+)(?![0-9])(?!\s+\d+\s+R)')
_OBJSTM_FIRST_RE = re.compile(rb'/First\s+(\d+)(?![0-9])(?!\s+\d+\s+R)')


def _iter_objects(data: bytes):
    """Yield (obj_num, dict_bytes, stream_bytes_or_None).

    Streams are skipped by their ``/Length`` entry, NOT by searching for
    ``endstream`` -- compressed bytes can contain any marker sequence
    (``endobj``, ``N M obj``), which a pure-regex object scan trips
    over (observed: one Flate stream in 500 contained ``endobj``).
    ``endstream`` search remains the fallback for indirect /Length."""
    pos = 0
    n = len(data)
    while pos < n:
        m = _OBJ_HEAD_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        eo = data.find(b'endobj', start)
        sm = _STREAM_OPEN_RE.search(data, start,
                                    eo if eo != -1 else n)
        if sm is None:
            body = data[start:eo if eo != -1 else n]
            yield int(m.group(1)), body, None
            pos = (eo + 6) if eo != -1 else n
            continue
        head = data[start:sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm:
            s0 = sm.end()
            s1 = s0 + int(lm.group(1))
            stream = data[s0:s1]
            eo2 = data.find(b'endobj', s1)
            pos = (eo2 + 6) if eo2 != -1 else n
        else:
            em = _ENDSTREAM_RE.search(data, sm.end())
            if em is None:
                break
            stream = data[sm.end():em.start()]
            eo2 = data.find(b'endobj', em.end())
            pos = (eo2 + 6) if eo2 != -1 else n
        yield int(m.group(1)), head, stream
# content-stream tokens: strings, hex strings, arrays, numbers, operators
_TOK_RE = re.compile(
    rb'\((?:[^()\\]|\\.)*\)'      # literal string (1-level; \-escapes)
    rb'|<[0-9A-Fa-f\s]*>'         # hex string
    rb'|\[|\]'
    rb'|/[^\s/\[\]()<>{}]+'
    rb'|[-+]?\d*\.?\d+'
    rb'|[A-Za-z\'"*]+')

_OCTAL_RE = re.compile(rb'\\([0-7]{1,3})')
_ESCAPES = {b'n': b'\n', b'r': b'\r', b't': b'\t', b'b': b'\b',
            b'f': b'\f', b'(': b'(', b')': b')', b'\\': b'\\'}


def _decode_literal(raw: bytes) -> str:
    """Literal string body (between parens) -> text.

    Bytes default to latin-1 (the writer's own convention, see _esc);
    a leading UTF-16BE BOM after unescaping switches to UTF-16BE --
    ISO 32000 7.9.2.2 allows text strings in EITHER encoding inside
    literal parentheses, and third-party writers (e.g. TeX-family)
    emit BOM'd literal show strings where this writer would emit a hex
    string."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b'\\' and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
                continue
            i += 1  # \<other>: drop the backslash
            continue
        out += c
        i += 1
    if out[:2] == b'\xfe\xff':
        return out[2:].decode('utf-16-be', 'replace')
    return out.decode('latin-1')


def _decode_hex(raw: bytes) -> str:
    h = re.sub(rb'\s+', b'', raw)
    if len(h) % 2:
        h += b'0'
    b = bytes.fromhex(h.decode('ascii'))
    if b[:2] == b'\xfe\xff':
        return b[2:].decode('utf-16-be', 'replace')
    return b.decode('latin-1')


_FILTER_RE = re.compile(rb'/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))')


def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b'>', 1)[0]
    h = re.sub(rb'\s+', b'', body)
    if len(h) % 2:
        h += b'0'
    return bytes.fromhex(h.decode('ascii'))


def _lzw_decode(data: bytes) -> bytes:
    """PDF LZWDecode (ISO 32000 7.4.4: TIFF-style LZW, MSB-first,
    9->12-bit codes, clear=256, EOD=257, EarlyChange=1)."""
    out = bytearray()
    table = {i: bytes([i]) for i in range(256)}
    next_code = 258
    bitlen = 9
    prev = None
    buf = nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= bitlen:
            nbits -= bitlen
            code = (buf >> nbits) & ((1 << bitlen) - 1)
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, bitlen, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code not in table:
                    raise ValueError('corrupt LZW first code %d' % code)
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            elif code == next_code and next_code < 4096:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError('corrupt LZW code %d' % code)
            # EarlyChange=1: widen one code before the table fills
            if next_code >= (1 << bitlen) - 1 and bitlen < 12:
                bitlen += 1
            out += entry
            prev = entry
    return bytes(out)


def _decode_stream(head: bytes, raw: bytes):
    """Apply the object's /Filter chain (single name or array, in
    order).  Supported: FlateDecode, LZWDecode, ASCIIHexDecode; an
    unsupported filter or a decode error returns None (the object is
    skipped, contained -- never fatal)."""
    m = _FILTER_RE.search(head)
    if not m:
        return raw
    names = (re.findall(rb'/([A-Za-z0-9]+)', m.group(1))
             if m.group(1) is not None else [m.group(2)])
    for name in names:
        try:
            if name == b'FlateDecode':
                raw = zlib.decompress(raw)
            elif name == b'LZWDecode':
                raw = _lzw_decode(raw)
            elif name == b'ASCIIHexDecode':
                raw = _ascii_hex_decode(raw)
            else:
                return None
        except Exception:
            return None
    return raw


def _expand_object_streams(dicts, streams):
    """PDF 1.5 compressed object streams (/Type /ObjStm): inflate each
    one, parse the N (objnum, offset) header pairs, and register the
    embedded dict-only objects.  Malformed object streams are skipped,
    never fatal."""
    for num in [n for n, d in dicts.items() if _OBJSTM_RE.search(d)]:
        raw = streams.get(num)
        nm = _OBJSTM_N_RE.search(dicts[num])
        fm = _OBJSTM_FIRST_RE.search(dicts[num])
        if raw is None or not nm or not fm:
            continue
        raw = _decode_stream(dicts[num], raw)
        if raw is None:
            continue
        n_objs, first = int(nm.group(1)), int(fm.group(1))
        try:
            header = raw[:first].split()
            pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                     for i in range(n_objs)]
        except (ValueError, IndexError):
            continue
        for i, (objnum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(raw) - first
            body = raw[first + off:first + end]
            dicts.setdefault(objnum, body)


def _page_content_streams(data: bytes):
    """Yield (page_index, inflated content bytes, page_height) in
    document order.  A page's /Contents may be a single reference or an
    array (the streams concatenate into one logical stream, ISO 32000
    7.8.2); page height comes from the page's own /MediaBox, inherited
    from the /Pages root when absent, defaulting to the writer's
    letter-size PAGE_H (ADVICE r03: externally produced A4 etc. must
    not be de-chromed against letter-size margin zones)."""
    dicts = {}
    streams = {}
    for num, head, stream in _iter_objects(data):
        dicts[num] = head
        if stream is not None:
            streams[num] = stream
    _expand_object_streams(dicts, streams)

    default_h = float(PAGE_H)
    for num in sorted(dicts):
        if _PAGES_RE.search(dicts[num]):
            mb = _MEDIABOX_RE.search(dicts[num])
            if mb:
                try:
                    default_h = (float(mb.group(4)) - float(mb.group(2)))
                except ValueError:
                    pass
                break

    pages = []
    for num in sorted(dicts):
        if _PAGE_RE.search(dicts[num]):
            am = _CONTENTS_ARR_RE.search(dicts[num])
            if am:
                cnums = [int(g) for g in _REF_RE.findall(am.group(1))]
            else:
                cm = _CONTENTS_RE.search(dicts[num])
                cnums = [int(cm.group(1))] if cm else []
            if not cnums:
                continue
            mb = _MEDIABOX_RE.search(dicts[num])
            page_h = default_h
            if mb:
                try:
                    page_h = float(mb.group(4)) - float(mb.group(2))
                except ValueError:
                    pass
            pages.append((cnums, page_h))

    for idx, (cnums, page_h) in enumerate(pages):
        parts = []
        for cnum in cnums:
            raw = streams.get(cnum)
            if raw is None:
                continue
            raw = _decode_stream(dicts.get(cnum, b''), raw)
            if raw is None:
                continue
            parts.append(raw)
        if not parts:
            continue
        yield idx, b'\n'.join(parts), page_h


def extract_text_runs(data: bytes):
    """Parse a PDF into positioned text runs.

    Returns a list of dicts ``{page, x, y, size, text, page_h}`` in
    emission order.  Unsupported constructs are skipped, never fatal
    (the malformed real world is the point of a recovering parser).
    """
    runs = []
    for page, content, page_h in _page_content_streams(data):
        x = y = 0.0
        lx = ly = 0.0          # line start (Td/Tm reference)
        size = 0.0
        leading = 0.0
        stack = []             # operand stack
        in_text = False
        for tok in _TOK_RE.finditer(content):
            t = tok.group(0)
            c = t[:1]
            if c == b'(':
                stack.append(('s', _decode_literal(t[1:-1])))
            elif c == b'<':
                stack.append(('s', _decode_hex(t[1:-1])))
            elif c == b'/' or c == b'[' or c == b']':
                stack.append(('n', t))
            elif c.isdigit() or c in b'+-.':
                try:
                    stack.append(('f', float(t)))
                except ValueError:
                    pass
            else:
                op = t
                if op == b'BT':
                    in_text = True
                    x = y = lx = ly = 0.0
                elif op == b'ET':
                    in_text = False
                elif op == b'Tf':
                    if stack and stack[-1][0] == 'f':
                        size = stack[-1][1]
                elif op == b'TL':
                    if stack and stack[-1][0] == 'f':
                        leading = stack[-1][1]
                elif op in (b'Td', b'TD'):
                    if len(stack) >= 2 and stack[-1][0] == 'f' \
                            and stack[-2][0] == 'f':
                        lx += stack[-2][1]
                        ly += stack[-1][1]
                        x, y = lx, ly
                        if op == b'TD':
                            leading = -stack[-1][1]
                elif op == b'Tm':
                    if len(stack) >= 6 and all(e[0] == 'f'
                                               for e in stack[-6:]):
                        lx, ly = stack[-2][1], stack[-1][1]
                        x, y = lx, ly
                elif op == b'T*':
                    ly -= leading
                    x, y = lx, ly
                elif op in (b"'", b'"') or op == b'Tj':
                    if op != b'Tj':
                        ly -= leading
                        x, y = lx, ly
                    if in_text and stack and stack[-1][0] == 's' \
                            and stack[-1][1]:
                        runs.append({'page': page, 'x': x, 'y': y,
                                     'size': size, 'text': stack[-1][1],
                                     'page_h': page_h})
                        x += 0.5 * size * len(stack[-1][1])  # advance est.
                elif op == b'TJ':
                    if in_text:
                        parts = [v for k, v in stack if k == 's']
                        text = ''.join(parts)
                        if text:
                            runs.append({'page': page, 'x': x, 'y': y,
                                         'size': size, 'text': text,
                                         'page_h': page_h})
                            x += 0.5 * size * len(text)
                stack = []
    return runs


# ---------------------------------------------------------------------------
# layout analysis
# ---------------------------------------------------------------------------


def layout_blocks(runs, line_tol_frac=0.5, block_gap_frac=1.8):
    """Runs -> ordered layout blocks.

    Lines: runs whose baselines agree within ``line_tol_frac * size``.
    Blocks: consecutive lines split when the vertical gap exceeds
    ``block_gap_frac`` x the page's dominant leading, or the font size
    changes.  Returns dicts ``{page, block_idx, kind, size, y_top,
    text, page_h}`` with ``kind`` heading/body by relative size, in
    reading order; ``page_h`` is the page's /MediaBox height so the
    de-chroming zones track the actual page size (ADVICE r03).
    """
    blocks = []
    by_page = {}
    for r in runs:
        by_page.setdefault(r['page'], []).append(r)
    # body size = char-weighted mode of run sizes, excluding the
    # largest size when smaller ones exist (so a title-only page still
    # classes its title as heading rather than defining 'body')
    mass = {}
    for r in runs:
        mass[r['size']] = mass.get(r['size'], 0) + len(r['text'])
    if len(mass) > 1:
        mx = max(mass)
        body_size = max((s for s in mass if s < mx),
                        key=lambda s: mass[s])
    elif mass:
        body_size = next(iter(mass))
    else:
        body_size = 0

    bidx = 0
    for page in sorted(by_page):
        rs = sorted(by_page[page], key=lambda r: (-r['y'], r['x']))
        # group into lines
        lines = []
        for r in rs:
            if lines and abs(lines[-1]['y'] - r['y']) \
                    <= line_tol_frac * max(r['size'], 1.0):
                lines[-1]['parts'].append(r['text'])
                lines[-1]['size'] = max(lines[-1]['size'], r['size'])
            else:
                lines.append({'y': r['y'], 'size': r['size'],
                              'parts': [r['text']]})
        # dominant leading (mode of successive gaps, rounded)
        gaps = [round(lines[i]['y'] - lines[i + 1]['y'], 1)
                for i in range(len(lines) - 1)
                if lines[i]['y'] > lines[i + 1]['y']]
        if gaps:
            lead = max(set(gaps), key=gaps.count)
        else:
            lead = LEADING
        page_h = float(rs[0].get('page_h', PAGE_H)) if rs else float(PAGE_H)
        # group lines into blocks
        cur = None
        for ln in lines:
            new = (cur is None
                   or ln['size'] != cur['size']
                   or (cur['y_last'] - ln['y']) > block_gap_frac * lead)
            if new:
                if cur:
                    blocks.append(cur)
                cur = {'page': page, 'size': ln['size'], 'y_top': ln['y'],
                       'y_last': ln['y'], 'page_h': page_h,
                       'texts': [' '.join(ln['parts'])]}
            else:
                cur['texts'].append(' '.join(ln['parts']))
                cur['y_last'] = ln['y']
        if cur:
            blocks.append(cur)

    out = []
    for b in blocks:
        kind = 'heading' if b['size'] >= 1.3 * max(body_size, 1.0) else 'body'
        out.append({'page': b['page'], 'block_idx': bidx, 'kind': kind,
                    'size': b['size'], 'y_top': b['y_top'],
                    'page_h': b['page_h'], 'text': ' '.join(b['texts'])})
        bidx += 1
    return out


_PAGENO_RE = re.compile(r'\b\d+\b')


def strip_repeated_furniture(blocks, min_frac=0.5, zone_frac=0.2):
    """Remove running headers/footers/page numbers: blocks in the outer
    ``zone_frac`` margins of the page whose digit-normalized text +
    rounded position recur on >= ``min_frac`` of pages.  The zone
    restriction keeps repeated *content* (a chorus, boilerplate the
    caller wants to keep as body) from being eaten; true page furniture
    lives in the margins.  Single-page documents are returned unchanged
    (no recurrence signal -- see :func:`strip_margin_furniture`)."""
    n_pages = len({b['page'] for b in blocks})
    if n_pages <= 1:
        return list(blocks)

    def in_body(b):
        page_h = float(b.get('page_h', PAGE_H))
        return zone_frac * page_h <= b['y_top'] <= (1.0 - zone_frac) * page_h

    def key(b):
        return (_PAGENO_RE.sub('#', b['text']).strip(),
                round(b['y_top'] / 4.0))

    seen = {}
    for b in blocks:
        if not in_body(b):
            seen.setdefault(key(b), set()).add(b['page'])
    keep = []
    for b in blocks:
        if not in_body(b) \
                and len(seen.get(key(b), ())) / n_pages >= min_frac:
            continue
        keep.append(b)
    return keep


def strip_margin_furniture(blocks, bottom=60, top=None, top_inset=60):
    """Zone-based de-chroming complement: blocks living entirely in the
    top/bottom page margins (running headers, footers, page numbers) are
    furniture regardless of repetition -- the heuristic that still works
    on single-page documents, where :func:`strip_repeated_furniture`
    has no recurrence signal.

    The top zone follows each block's own page height (``page_h`` from
    its /MediaBox): an A4 page's header zone starts at 842-``top_inset``,
    not at the letter-size writer constant (ADVICE r03).  Pass ``top``
    to force an absolute ceiling instead."""
    if top is not None:
        return [b for b in blocks if bottom <= b['y_top'] <= top]
    return [b for b in blocks
            if bottom <= b['y_top']
            <= float(b.get('page_h', PAGE_H)) - top_inset]
