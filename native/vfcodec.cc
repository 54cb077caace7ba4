// Native TFRecord/proto codec for the host data-loader hot path.
//
// The reference leaned on TensorFlow's C++ tf.data kernels for shard IO
// (/root/reference/viewformer/data/tfrecord_dataset.py); this library is the
// equivalent native layer for the TF-free reader in
// viewformer_tpu/data/tfrecord.py, exposed via ctypes:
//   vf_crc32c          - CRC32C (Castagnoli), SSE4.2 hardware path
//   vf_index_records   - walk TFRecord framing -> (offset, length) pairs
//   vf_decode_varints  - packed int64 varint list decode (code tokens)
//   vf_masked_crc      - TFRecord masked crc of a buffer
//
// Build: g++ -O3 -shared -fPIC -msse4.2 -o libvfcodec.so vfcodec.cc

#include <cstddef>
#include <cstdint>
#include <cstring>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#define VF_HAVE_HW_CRC 1
#endif

namespace {

uint32_t crc32c_table[256];
bool table_initialized = false;

void init_table() {
  if (table_initialized) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    crc32c_table[i] = crc;
  }
  table_initialized = true;
}

uint32_t crc32c_sw(uint32_t crc, const uint8_t* data, size_t n) {
  init_table();
  crc = ~crc;
  for (size_t i = 0; i < n; ++i)
    crc = crc32c_table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

#ifdef VF_HAVE_HW_CRC
uint32_t crc32c_hw(uint32_t crc, const uint8_t* data, size_t n) {
  crc = ~crc;
  while (n >= 8) {
    uint64_t chunk;
    std::memcpy(&chunk, data, 8);
    crc = static_cast<uint32_t>(_mm_crc32_u64(crc, chunk));
    data += 8;
    n -= 8;
  }
  while (n > 0) {
    crc = _mm_crc32_u8(crc, *data);
    ++data;
    --n;
  }
  return ~crc;
}
#endif

uint32_t crc32c(const uint8_t* data, size_t n) {
#ifdef VF_HAVE_HW_CRC
  return crc32c_hw(0, data, n);
#else
  return crc32c_sw(0, data, n);
#endif
}

}  // namespace

extern "C" {

uint32_t vf_crc32c(const uint8_t* data, size_t n) { return crc32c(data, n); }

uint32_t vf_masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// Walk TFRecord framing in a memory-mapped shard buffer. Writes up to
// max_records (offset, total_length) pairs; returns the number of records, or
// -1 on framing corruption (truncated record).
int64_t vf_index_records(const uint8_t* buf, size_t n, int64_t* offsets,
                         int64_t* lengths, int64_t max_records) {
  size_t pos = 0;
  int64_t count = 0;
  while (pos < n && count < max_records) {
    if (pos + 12 > n) return -1;
    uint64_t payload_len;
    std::memcpy(&payload_len, buf + pos, 8);
    size_t total = 8 + 4 + payload_len + 4;
    if (pos + total > n) return -1;
    offsets[count] = static_cast<int64_t>(pos);
    lengths[count] = static_cast<int64_t>(total);
    pos += total;
    ++count;
  }
  return count;
}

// Decode a packed repeated-int64 varint buffer. Returns the number of values
// decoded, or -1 on overflow/overrun.
int64_t vf_decode_varints(const uint8_t* buf, size_t n, int64_t* out,
                          int64_t max_out) {
  size_t pos = 0;
  int64_t count = 0;
  while (pos < n) {
    if (count >= max_out) return -1;
    uint64_t result = 0;
    int shift = 0;
    while (true) {
      if (pos >= n || shift > 63) return -1;
      uint8_t byte = buf[pos++];
      result |= static_cast<uint64_t>(byte & 0x7F) << shift;
      if (!(byte & 0x80)) break;
      shift += 7;
    }
    out[count++] = static_cast<int64_t>(result);
  }
  return count;
}

// Verify the framing CRCs of one record starting at buf (length header at
// buf[0..8)). Returns 1 when valid, 0 otherwise.
int32_t vf_verify_record(const uint8_t* buf, size_t n) {
  if (n < 12) return 0;
  uint64_t payload_len;
  std::memcpy(&payload_len, buf, 8);
  if (8 + 4 + payload_len + 4 > n) return 0;
  uint32_t stored_len_crc;
  std::memcpy(&stored_len_crc, buf + 8, 4);
  if (vf_masked_crc(buf, 8) != stored_len_crc) return 0;
  uint32_t stored_payload_crc;
  std::memcpy(&stored_payload_crc, buf + 12 + payload_len, 4);
  return vf_masked_crc(buf + 12, payload_len) == stored_payload_crc ? 1 : 0;
}

}  // extern "C"
