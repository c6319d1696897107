"""Op layer: jittable, vmappable re-implementations of the OpenCV kernel
surface used by the reference (SURVEY.md §2.2 table). Every op documents the
reference call sites it replaces and is differentially tested against cv2."""
