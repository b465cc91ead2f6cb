from .labels import voc_labels, label_map, rev_label_map, distinct_colors, label_color_map
