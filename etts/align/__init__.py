from .durations import (duration_to_alignment_matrix, clean_attention,
                        weight_mask, fill_zeros, fix_attention_jumps,
                        binary_attention, get_durations_from_alignment)
