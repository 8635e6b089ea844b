"""Evaluation harness: batched inference over test sets + WER / SIM / UTMOS scoring
(reference `src/f5_tts/eval/*`)."""
