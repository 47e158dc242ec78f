"""Text frontend: cleaner -> phonemizer -> tokenizer pipeline.

Parity with `TransformerTTS/preprocessing/text/__init__.py:6-40` plus the
keithito stack (`gst_tacotron/text/`) for the Tacotron model.
"""
from .symbols import _phonemes, _punctuations, keithito_symbols
from .cleaners import English, German
from .tokenizer import Tokenizer, Phonemizer
from .cmudict import CMUDict
from .keithito import text_to_sequence, sequence_to_text

__all__ = ["Pipeline", "English", "German", "Tokenizer", "Phonemizer",
           "CMUDict", "text_to_sequence", "sequence_to_text",
           "keithito_symbols"]


class Pipeline:
    def __init__(self, cleaner, phonemizer, tokenizer):
        self.cleaner = cleaner
        self.phonemizer = phonemizer
        self.tokenizer = tokenizer

    def __call__(self, input_text):
        text = self.cleaner(input_text)
        phons = self.phonemizer(text)
        return self.tokenizer(phons)

    @classmethod
    def _make(cls, language, add_start_end, with_stress, strip, backend=None):
        if language == 'en':
            cleaner = English()
        elif language == 'de':
            cleaner = German()
        else:
            raise ValueError(f'language must be "en" or "de", not {language!r}')
        phonemizer = Phonemizer(language=language, strip=strip,
                                with_stress=with_stress, backend=backend)
        tokenizer = Tokenizer(sorted(list(_phonemes) + list(_punctuations)),
                              add_start_end=add_start_end)
        return cls(cleaner=cleaner, phonemizer=phonemizer, tokenizer=tokenizer)

    @classmethod
    def default_pipeline(cls, language, add_start_end, with_stress, backend=None):
        return cls._make(language, add_start_end, with_stress, strip=False,
                         backend=backend)

    @classmethod
    def default_training_pipeline(cls, language, add_start_end, with_stress,
                                  backend=None):
        return cls._make(language, add_start_end, with_stress, strip=True,
                         backend=backend)
