"""One-time extraction of HRP-4 dynamics parameters into assets/*.json.

Reads the robot description URDFs shipped with the reference
(/root/reference/code/urdf/hrp4*.urdf — themselves generated from the
public hrp4_description ROS package) and stores only the dynamics-relevant
facts (link inertials, joint tree, axes, limits) as compact JSON.  Meshes,
visuals and collision geometry are dropped; the framework's contact model
uses the foot polygon from the controller spec instead.

Run:  python tools/extract_hrp4.py [reference_urdf_dir] [out_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cmpc_tpu.rbd.urdf import _read_urdf_xml  # noqa: E402


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/code/urdf"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "assets")
    os.makedirs(out, exist_ok=True)
    for stem in ("hrp4", "hrp4_payload"):
        spec = _read_urdf_xml(os.path.join(src, stem + ".urdf"))
        path = os.path.join(out, stem + ".json")
        with open(path, "w") as f:
            json.dump(spec, f, indent=None, separators=(",", ":"))
        print(f"wrote {path}: {len(spec['links'])} links, "
              f"{len(spec['joints'])} joints")


if __name__ == "__main__":
    main()
