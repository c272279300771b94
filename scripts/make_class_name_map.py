"""Generate the class-index → class-name json the CAM/evaluate examples read
(the reference ships a hand-made imagenet_dog_class_names/num_to_dog_name_map.json).

The mapping is defined by the dataset itself: class indices are assigned in
sorted directory-name order (data_loading/image_data_loader.py builds
class_name_num_map that way), so the json is derivable from the training
folder:

    python scripts/make_class_name_map.py /path/to/train_img out.json
"""

import json
import os
import sys


def build_map(base_folder):
    names = sorted(c for c in os.listdir(base_folder)
                   if os.path.isdir(os.path.join(base_folder, c)))
    return {str(i): name for i, name in enumerate(names)}


if __name__ == "__main__":
    base, out = sys.argv[1], sys.argv[2]
    with open(out, "w") as f:
        json.dump(build_map(base), f, indent=4)
    print("wrote", out)
