from .biogpt import forward, logits_for_tokens  # noqa: F401
