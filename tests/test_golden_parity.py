"""Golden parity against the reference's own real-world fixtures.

Uses the *data* fixtures under /root/reference/test/datafiles as oracles
(read-only public content; no reference code is executed or copied):

* readability_features.json -- the (222, 1) feature vector the reference
  asserts against for models_testing.html
  (/root/reference/test/test_readability.py:13-21).  Passing this means
  the stdlib-based HTML parser, the blockifier walker (tag-id
  assignment, ancestors, class weights) and the readability kernel are
  jointly equivalent to libxml2 + the Cython/C++ original on a messy
  100 KB real-world page.
* component equality (test_extractor.py:22-64): extract == manually
  chained blockify -> features -> fixed-coefficient LR -> threshold ->
  join.
"""

import io
import json
import os

import numpy as np
import pytest

REF = '/root/reference/test/datafiles'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference fixtures not present')


@pytest.fixture(scope='module')
def models_testing_html():
    with io.open(os.path.join(REF, 'models_testing.html')) as f:
        return f.read()


def test_readability_golden_vector(models_testing_html):
    from dragnet_spark.kernels.blocks import blockify
    from dragnet_spark.kernels.features.readability import (
        readability_features)
    blks = blockify(models_testing_html, do_tagcount=True, do_css=True,
                    do_readability=True)
    with io.open(os.path.join(REF, 'readability_features.json')) as f:
        expected = np.array(json.loads(f.read()))
    assert len(blks) == len(expected) == 222
    actual = readability_features(blks).flatten()
    assert np.allclose(actual, expected, rtol=0.0005)


def test_extractor_component_equality(models_testing_html):
    """Extractor output == manually chained components with the published
    fixed-coefficient LR (weninger+kohlschuetter+readability order)."""
    from dragnet_spark.kernels.blocks import blockify
    from dragnet_spark.kernels.features import compute
    from dragnet_spark.model import LogisticModel
    from dragnet_spark.operators.extract import process_document

    order = ('weninger', 'kohlschuetter', 'readability')
    coef = [0.00501458328421719, -0.0006331822163374379,
            -0.6699789320373452, 0.026069227973339763, -1.5552477377277252,
            0.02980432745983307, -0.965575689884716, 0.019509367890934326,
            -0.35692924115362307]
    model = LogisticModel(coef, -1.2071425754440765, prob_threshold=0.5,
                          features=order)

    # component chain
    blks = blockify(models_testing_html)  # default: tagcount+readability
    mat = compute(blks, order)
    preds = model.predict(mat)
    components_content = '\n'.join(
        b.text for b, p in zip(blks, preds) if p)

    # pipeline path over a single text span
    spans = [{'kind': 'text', 'text': models_testing_html,
              'media_ref': '', 'offset': 0}]
    _, content, status = process_document(spans, model, order)
    assert status == 'ok'
    assert content == components_content
    assert len(components_content) > 1000  # nontrivial extraction


@pytest.mark.parametrize('fileroot', ['page_comments', 'page_no_comments'])
def test_gold_standard_blocks_golden(fileroot):
    """Byte-equal reproduction of the reference's gold block extraction
    (test/test_data_processing.py:88-101): blockify + LCS labeling of the
    Corrected gold text must emit the exact 5-field TSV the reference
    ships as *_expected.block_corrected.txt."""
    import re

    from dragnet_spark.operators.labeling import label_document

    with io.open(os.path.join(REF, 'HTML', fileroot + '.html')) as f:
        html = f.read()
    with io.open(os.path.join(
            REF, 'Corrected', fileroot + '.html.corrected.txt')) as f:
        gold = f.read()
    parts = re.split(r'\n*!@#\$%\^&\*\(\)\s+COMMENTS\n*', gold, maxsplit=1)
    content = parts[0].strip()
    comments = parts[1].strip() if len(parts) > 1 else ''

    rows = label_document(
        fileroot,
        [{'kind': 'text', 'text': html, 'media_ref': '', 'offset': 0}],
        content, comments)
    lines = ''.join(
        '%s\t%s\t%s\t%s\t%s\n' % (
            r['content_frac'], r['comments_frac'],
            ' '.join(r['all_tokens']), ' '.join(r['content_tokens']),
            ' '.join(r['comments_tokens']))
        for r in rows)
    with io.open(os.path.join(
            REF, 'block_corrected',
            fileroot + '_expected.block_corrected.txt')) as f:
        expected = f.read()
    assert lines == expected
