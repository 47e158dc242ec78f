from .dataset import (Dataset, DataPrepper, ForwardDataPrepper, load_files,
                      VocoderDataset, collate_vocoder, pad_to_multiple,
                      Prefetcher, fast_forward_permutation)
