"""Hand-written protobuf wire codec for the reference gRPC service
(reference runtime/python/grpc/proto/paraformer.proto, served by
runtime/grpc/paraformer-server.cc).

No protoc python plugin exists in this image, and the schema is four
scalar fields per message — so the proto3 wire format is encoded/decoded
directly (varints + length-delimited fields), making the gRPC server
byte-compatible with reference protobuf clients:

    service paraformer.ASR { rpc Recognize(stream Request)
                             returns (stream Response) }
    message Request  { DecodeMode mode = 1; WavFormat wav_format = 2;
                       int32 sampling_rate = 3;
                       repeated int32 chunk_size = 4;   // packed
                       bool is_final = 5; bytes audio_data = 6; }
    message Response { DecodeMode mode = 1; string text = 2;
                       bool is_final = 3; }

DecodeMode: 0 offline, 1 online, 2 two_pass.  WavFormat: 0 pcm.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

MODE_OFFLINE, MODE_ONLINE, MODE_TWO_PASS = 0, 1, 2

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _varint(n: int) -> bytes:
    if n < 0:  # proto int32 negatives: 10-byte two's complement varint
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _int32(v: int) -> int:
    """proto3 *int32* (NOT zigzag sint32) semantics: varints are 64-bit
    two's complement, truncated to the signed 32-bit range (a negative
    value must decode as negative — recognizably invalid — not ~4.3e9)."""
    v &= (1 << 64) - 1
    if v >= 1 << 63:
        v -= 1 << 64
    v = ((v + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)
    return v


def _skip(data: bytes, pos: int, wire: int) -> int:
    if wire == _WIRE_VARINT:
        _, pos = _read_varint(data, pos)
    elif wire == _WIRE_I64:
        pos += 8
    elif wire == _WIRE_LEN:
        n, pos = _read_varint(data, pos)
        pos += n
    elif wire == _WIRE_I32:
        pos += 4
    else:
        raise ValueError(f"unknown wire type {wire}")
    if pos > len(data):
        raise ValueError("truncated field")
    return pos


def _fields(data: bytes):
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == _WIRE_VARINT:
            val, pos = _read_varint(data, pos)
        elif wire == _WIRE_LEN:
            n, pos = _read_varint(data, pos)
            if pos + n > len(data):
                raise ValueError("truncated length-delimited field")
            val = data[pos: pos + n]
            pos += n
        else:
            start = pos
            pos = _skip(data, pos, wire)
            val = data[start:pos]
        yield field, wire, val


def encode_request(mode: int = MODE_OFFLINE, wav_format: int = 0,
                   sampling_rate: int = 16000,
                   chunk_size: List[int] = (),
                   is_final: bool = False,
                   audio_data: bytes = b"") -> bytes:
    out = bytearray()
    if mode:
        out += _tag(1, _WIRE_VARINT) + _varint(mode)
    if wav_format:
        out += _tag(2, _WIRE_VARINT) + _varint(wav_format)
    if sampling_rate:
        out += _tag(3, _WIRE_VARINT) + _varint(sampling_rate)
    if chunk_size:
        packed = b"".join(_varint(int(c)) for c in chunk_size)
        out += _tag(4, _WIRE_LEN) + _varint(len(packed)) + packed
    if is_final:
        out += _tag(5, _WIRE_VARINT) + _varint(1)
    if audio_data:
        out += _tag(6, _WIRE_LEN) + _varint(len(audio_data)) + audio_data
    return bytes(out)


def decode_request(data: bytes) -> Dict[str, Any]:
    req: Dict[str, Any] = {"mode": 0, "wav_format": 0, "sampling_rate": 0,
                           "chunk_size": [], "is_final": False,
                           "audio_data": b""}
    for field, wire, val in _fields(data):
        if field == 1 and wire == _WIRE_VARINT:
            req["mode"] = int(val)
        elif field == 2 and wire == _WIRE_VARINT:
            req["wav_format"] = int(val)
        elif field == 3 and wire == _WIRE_VARINT:
            req["sampling_rate"] = _int32(int(val))
        elif field == 4 and wire == _WIRE_LEN:  # packed repeated int32
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                req["chunk_size"].append(_int32(v))
        elif field == 4 and wire == _WIRE_VARINT:  # unpacked writer
            req["chunk_size"].append(_int32(int(val)))
        elif field == 5 and wire == _WIRE_VARINT:
            req["is_final"] = bool(val)
        elif field == 6 and wire == _WIRE_LEN:
            req["audio_data"] += val
    return req


def encode_response(mode: int = MODE_OFFLINE, text: str = "",
                    is_final: bool = False) -> bytes:
    out = bytearray()
    if mode:
        out += _tag(1, _WIRE_VARINT) + _varint(mode)
    if text:
        tb = text.encode("utf-8")
        out += _tag(2, _WIRE_LEN) + _varint(len(tb)) + tb
    if is_final:
        out += _tag(3, _WIRE_VARINT) + _varint(1)
    return bytes(out)


def decode_response(data: bytes) -> Dict[str, Any]:
    res: Dict[str, Any] = {"mode": 0, "text": "", "is_final": False}
    for field, wire, val in _fields(data):
        if field == 1 and wire == _WIRE_VARINT:
            res["mode"] = int(val)
        elif field == 2 and wire == _WIRE_LEN:
            res["text"] = val.decode("utf-8", "replace")
        elif field == 3 and wire == _WIRE_VARINT:
            res["is_final"] = bool(val)
    return res
