from .sampling import filter_logits_and_sample, top_a, top_k, top_p
