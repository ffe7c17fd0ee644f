"""PySpark-native temporal feature-engineering engine.

A from-scratch re-expression of the capabilities of
``Hiroshiba/acoustic_feature_extractor`` (reference at ``/root/reference``,
studied read-only) as an idiomatic Spark DataFrame engine over turn-level
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``:

- point-in-time / as-of joins (reference ``sampling_data.py:29-51`` resample)
- lag/lead context windows (``linguistic_feature.py:81-117``)
- rolling-frame degeneration (``sampling_data.py:141-176``)
- gap sessionization (``tool/tool_split_wave.py:47-76``)
- forward-fill / linear-interp backfill (``f0.py:70-83``)
- two-phase statistics + broadcast normalization (``f0.py:92-126``)
- interval expansion / overlap joins (``linguistic_feature.py:129-150``,
  ``extract_silence_expanded_label.py:30-61``)
- weighted percentiles & iterative range refinement (``extract_f0_range.py``)
- skew salting for mega-entities (``extract_f0_range.py:50-78`` analog)

plus training-data-pipeline operators (dedup, similarity search, text
quality, multimodal plumbing) that the 100 TB use case requires.

Everything is DataFrame/Window/built-in-function first; Arrow-batched pandas
UDFs only where Catalyst cannot express the semantics. No per-row Python.
"""

__version__ = "0.1.0"
