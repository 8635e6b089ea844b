"""Host-side text frontend: vocab tokenizer, chunking, pinyin conversion."""

from eraxvif5tts_tpu.text.tokenizer import (  # noqa: F401
    get_tokenizer,
    list_str_to_idx,
    list_str_to_bytes,
)
from eraxvif5tts_tpu.text.chunk import chunk_text  # noqa: F401
from eraxvif5tts_tpu.text.pinyin import convert_char_to_pinyin  # noqa: F401
