from .extract import extract, process_document  # noqa: F401
from .blocks_df import blockify_df  # noqa: F401
