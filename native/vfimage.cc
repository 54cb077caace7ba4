// Native JPEG decode for the host data plane.
//
// The reference's input pipelines decode JPEG on the host inside TF's C++
// tf.data kernels / torch DataLoader workers
// (/root/reference/viewformer/data/tfrecord_dataset.py:222-274,
//  tfrecord_dataset_th.py:199-217). This is the equivalent native layer for
// viewformer_tpu/data/pipeline.py: libjpeg decode behind ctypes (ctypes
// releases the GIL for the call, so the pipeline's ThreadPoolExecutor scales
// across cores without process pools).
//
// Build: g++ -O3 -shared -fPIC -o libvfimage.so vfimage.cc -ljpeg

#include <csetjmp>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

void output_message(j_common_ptr) {}  // silence stderr chatter

}  // namespace

extern "C" {

// Parse the header: returns 0 and fills (width, height, channels-after-
// decode) on success, -1 on parse failure. channels is 3 (we force RGB
// output for grayscale/YCbCr; CMYK is rejected).
int64_t vf_jpeg_info(const unsigned char* data, size_t len,
                     int64_t* width, int64_t* height, int64_t* channels) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = output_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  *channels = 3;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode into caller buffer `out` of size out_len (must be >= h*w*3).
// Output is tightly-packed RGB uint8. Returns 0 on success, -1 on failure.
int64_t vf_jpeg_decode(const unsigned char* data, size_t len,
                       unsigned char* out, size_t out_len) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = output_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr -> RGB
  jpeg_start_decompress(&cinfo);
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  if (out_len < stride * cinfo.output_height || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
