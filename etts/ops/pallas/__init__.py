from .wavernn_cell import wavernn_sample_loop, pallas_available
