from .chat import ChatClient
from .correction import (LLMCorrector, correct_text_only, load_hotwords_list,
                         process_speech_result)

__all__ = ["ChatClient", "LLMCorrector", "correct_text_only",
           "load_hotwords_list", "process_speech_result"]
