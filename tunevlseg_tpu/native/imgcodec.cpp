// Native image decoder for the host input pipeline.
//
// The reference's data path leans on cv2's C++ decoders through the Python
// GIL; this extension gives the framework its own native decode stage:
// libjpeg/libpng directly into a fresh numpy buffer, with the GIL RELEASED
// for the whole decode so a Python thread pool scales across host cores
// (data/pipeline.py threads are otherwise serialized on decode-bound work).
//
// Exposed functions (module tunevlseg_tpu.native._imgcodec):
//   decode(data: bytes, gray: int) -> uint8 ndarray (H,W,3) RGB or (H,W)
//   decode_file(path: str, gray: int) -> same, file IO also in C
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct DecodeResult {
  std::vector<unsigned char> pixels;
  int height = 0;
  int width = 0;
  int channels = 0;  // 1 or 3
  std::string error;
};

// ---------------------------------------------------------------- JPEG ----
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
  char message[JMSG_LENGTH_MAX];
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(const unsigned char* data, size_t size, bool gray,
                 DecodeResult* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    out->error = jerr.message;
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int h = static_cast<int>(cinfo.output_height);
  const int w = static_cast<int>(cinfo.output_width);
  const int c = cinfo.output_components;
  out->pixels.resize(static_cast<size_t>(h) * w * c);
  const size_t stride = static_cast<size_t>(w) * c;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->pixels.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out->height = h;
  out->width = w;
  out->channels = c;
  return true;
}

// ----------------------------------------------------------------- PNG ----
struct PngReadState {
  const unsigned char* data;
  size_t size;
  size_t offset;
};

void png_read_from_memory(png_structp png, png_bytep dst, png_size_t len) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->offset + len > s->size) {
    png_error(png, "png: truncated stream");
  }
  std::memcpy(dst, s->data + s->offset, len);
  s->offset += len;
}

bool decode_png(const unsigned char* data, size_t size, bool gray,
                DecodeResult* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    out->error = "png_create_read_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    out->error = "png_create_info_struct failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    out->error = "png decode failed";
    return false;
  }
  PngReadState state{data, size, 0};
  png_set_read_fn(png, &state, png_read_from_memory);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (gray) {
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE) {
      // cv2 IMREAD_GRAYSCALE BT.601 integer weights
      png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
    }
  } else {
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA) {
      png_set_gray_to_rgb(png);
    }
  }
  png_read_update_info(png, info);

  const int c = gray ? 1 : 3;
  out->pixels.resize(static_cast<size_t>(h) * w * c);
  std::vector<png_bytep> rows(h);
  const size_t stride = static_cast<size_t>(w) * c;
  for (png_uint_32 y = 0; y < h; ++y) {
    rows[y] = out->pixels.data() + y * stride;
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out->height = static_cast<int>(h);
  out->width = static_cast<int>(w);
  out->channels = c;
  return true;
}

bool decode_any(const unsigned char* data, size_t size, bool gray,
                DecodeResult* out) {
  if (size >= 2 && data[0] == 0xFF && data[1] == 0xD8) {
    return decode_jpeg(data, size, gray, out);
  }
  if (size >= 4 && data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' &&
      data[3] == 'G') {
    return decode_png(data, size, gray, out);
  }
  out->error = "unsupported image format (not JPEG/PNG)";
  return false;
}

PyObject* result_to_array(DecodeResult& res) {
  npy_intp dims3[3] = {res.height, res.width, res.channels};
  npy_intp dims2[2] = {res.height, res.width};
  PyObject* arr =
      res.channels == 1
          ? PyArray_SimpleNew(2, dims2, NPY_UINT8)
          : PyArray_SimpleNew(3, dims3, NPY_UINT8);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)),
              res.pixels.data(), res.pixels.size());
  return arr;
}

PyObject* py_decode(PyObject*, PyObject* args) {
  Py_buffer buf;
  int gray = 0;
  if (!PyArg_ParseTuple(args, "y*|i", &buf, &gray)) return nullptr;
  DecodeResult res;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = decode_any(static_cast<const unsigned char*>(buf.buf),
                  static_cast<size_t>(buf.len), gray != 0, &res);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, res.error.c_str());
    return nullptr;
  }
  return result_to_array(res);
}

PyObject* py_decode_file(PyObject*, PyObject* args) {
  const char* path;
  int gray = 0;
  if (!PyArg_ParseTuple(args, "s|i", &path, &gray)) return nullptr;
  DecodeResult res;
  bool ok = false;
  std::string io_error;
  Py_BEGIN_ALLOW_THREADS
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    io_error = "cannot open file";
  } else {
    std::fseek(fp, 0, SEEK_END);
    long n = std::ftell(fp);
    std::fseek(fp, 0, SEEK_SET);
    std::vector<unsigned char> data(n > 0 ? static_cast<size_t>(n) : 0);
    if (n > 0 && std::fread(data.data(), 1, data.size(), fp) != data.size()) {
      io_error = "short read";
    }
    std::fclose(fp);
    if (io_error.empty()) {
      ok = decode_any(data.data(), data.size(), gray != 0, &res);
    }
  }
  Py_END_ALLOW_THREADS
  if (!io_error.empty()) {
    PyErr_Format(PyExc_IOError, "%s: %s", io_error.c_str(), path);
    return nullptr;
  }
  if (!ok) {
    PyErr_Format(PyExc_ValueError, "%s: %s", res.error.c_str(), path);
    return nullptr;
  }
  return result_to_array(res);
}

PyMethodDef methods[] = {
    {"decode", py_decode, METH_VARARGS,
     "decode(data: bytes, gray=0) -> uint8 ndarray (RGB HWC or gray HW)"},
    {"decode_file", py_decode_file, METH_VARARGS,
     "decode_file(path: str, gray=0) -> uint8 ndarray"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_imgcodec",
                         "native JPEG/PNG decoder", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__imgcodec(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
