"""dragnet_spark: PySpark-native main-content extraction engine.

A from-scratch re-implementation (NOT a port) of the computation in
dragnet-org/dragnet -- blockify -> featurize -> classify -> reassemble --
as idiomatic Spark over tables of interleaved text+media span documents.
See SURVEY.md for the full blueprint and reference citations.
"""

__version__ = '0.1.0'

from .kernels.blocks import Block, BlockifyError, blockify  # noqa: F401
from .model import LogisticModel, default_model, reference_oracle_model  # noqa: F401
from .operators.extract import (  # noqa: F401
    extract, extract_comments, extract_content,
    extract_content_and_comments, process_document,
)
from .operators.blocks_df import blockify_df  # noqa: F401
