from .chat import ChatClient
from .correction import (LLMCorrector, correct_text_only,
                         load_hotword_options, load_hotwords_list,
                         process_speech_result, process_with_context)

__all__ = ["ChatClient", "LLMCorrector", "correct_text_only",
           "load_hotword_options", "load_hotwords_list",
           "process_speech_result", "process_with_context"]
