from .extract_stream import extract_stream, run_file_stream  # noqa: F401
