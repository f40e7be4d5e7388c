from rmcl_tpu.data.tokenizer import WordPieceTokenizer, get_tokenizer  # noqa: F401
