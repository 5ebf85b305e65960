"""Wire-compatible protobuf message classes for segmentation results.

Message classes are created dynamically from a descriptor set compiled by
``protoc`` (cached next to the .proto), avoiding any protoc-gencode /
runtime version coupling.  The schema matches the reference
(segment_util/segmentation.proto:34-191) field-for-field, so emitted ``.pb``
streams interoperate with the reference tools.
"""

from __future__ import annotations

import os
import subprocess

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_HERE = os.path.dirname(os.path.abspath(__file__))
_PROTO = os.path.join(_HERE, "segmentation.proto")
_DESC = os.path.join(_HERE, "segmentation.desc")


def _ensure_descriptor_set() -> bytes:
    if not os.path.exists(_DESC) or os.path.getmtime(_DESC) < os.path.getmtime(_PROTO):
        subprocess.run(
            [
                "protoc",
                f"--proto_path={_HERE}",
                f"--descriptor_set_out={_DESC}",
                _PROTO,
            ],
            check=True,
        )
    with open(_DESC, "rb") as f:
        return f.read()


_fds = descriptor_pb2.FileDescriptorSet()
_fds.ParseFromString(_ensure_descriptor_set())
_pool = descriptor_pool.DescriptorPool()
for _f in _fds.file:
    _pool.Add(_f)


def _cls(name: str):
    return message_factory.GetMessageClass(_pool.FindMessageTypeByName(name))


SegmentationDesc = _cls("segmentation.SegmentationDesc")
RegionFeatures = _cls("segmentation.RegionFeatures")

# Nested message conveniences.
Rasterization = SegmentationDesc.Rasterization
ScanInterval = SegmentationDesc.Rasterization.ScanInterval
ShapeMoments = SegmentationDesc.ShapeMoments
VectorMesh = SegmentationDesc.VectorMesh
Polygon = SegmentationDesc.Polygon
Vectorization = SegmentationDesc.Vectorization
Region2D = SegmentationDesc.Region2D
CompoundRegion = SegmentationDesc.CompoundRegion
HierarchyLevel = SegmentationDesc.HierarchyLevel

N4_CONNECT = 1
N8_CONNECT = 2

__all__ = [
    "SegmentationDesc",
    "RegionFeatures",
    "Rasterization",
    "ScanInterval",
    "ShapeMoments",
    "VectorMesh",
    "Polygon",
    "Vectorization",
    "Region2D",
    "CompoundRegion",
    "HierarchyLevel",
    "N4_CONNECT",
    "N8_CONNECT",
]
