// Fast binary-PLY point-cloud parser — native replacement for the python
// struct-based reader on multi-million-point clouds (the reference loads
// clouds through Open3D's C++ IO; simple_benchmark.py:172).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -fopenmp ply_parser.cpp -o libgpcr_ply.so
//
// API (C):
//   // Parse header + vertex data. Returns 0 on success.
//   // Caller passes pre-allocated output buffers sized from ply_count().
//   long ply_count(const char* path);             // vertex count, -1 on error
//   int  ply_read(const char* path, long n,
//                 float* xyz,                      // (n, 3), required
//                 float* rgb,                      // (n, 3) or null
//                 float* normal,                   // (n, 3) or null
//                 int* has_rgb, int* has_normal);

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Prop {
  std::string name;
  int size;   // bytes
  char kind;  // 'f' float, 'd' double, 'u' uint, 'i' int
};

struct Header {
  long n_verts = -1;
  bool binary_le = false, binary_be = false, ascii = false;
  std::vector<Prop> props;
  long data_offset = 0;
};

int prop_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

char prop_kind(const std::string& t) {
  if (t == "float" || t == "float32") return 'f';
  if (t == "double" || t == "float64") return 'd';
  if (t[0] == 'u') return 'u';
  return 'i';
}

bool parse_header(FILE* f, Header& h) {
  char line[4096];
  if (!fgets(line, sizeof line, f) || strncmp(line, "ply", 3) != 0) return false;
  std::string cur_elem;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("format ", 0) == 0) {
      h.binary_le = s.find("binary_little_endian") != std::string::npos;
      h.binary_be = s.find("binary_big_endian") != std::string::npos;
      h.ascii = s.find("ascii") != std::string::npos;
    } else if (s.rfind("element ", 0) == 0) {
      char name[256];
      long cnt;
      if (sscanf(s.c_str(), "element %255s %ld", name, &cnt) == 2) {
        cur_elem = name;
        if (cur_elem == "vertex") h.n_verts = cnt;
      }
    } else if (s.rfind("property ", 0) == 0 && cur_elem == "vertex") {
      char t[64], nm[256];
      if (s.rfind("property list", 0) == 0) return false;  // lists unsupported
      if (sscanf(s.c_str(), "property %63s %255s", t, nm) == 2) {
        int sz = prop_size(t);
        if (sz < 0) return false;
        h.props.push_back({nm, sz, prop_kind(t)});
      }
    } else if (s == "end_header") {
      h.data_offset = ftell(f);
      return h.n_verts >= 0;
    }
  }
  return false;
}

double read_val(const unsigned char* p, const Prop& pr, bool be) {
  unsigned char buf[8];
  if (be) {
    for (int i = 0; i < pr.size; i++) buf[i] = p[pr.size - 1 - i];
    p = buf;
  }
  switch (pr.kind) {
    case 'f': {
      float v;
      memcpy(&v, p, 4);
      return v;
    }
    case 'd': {
      double v;
      memcpy(&v, p, 8);
      return v;
    }
    case 'u': {
      uint64_t v = 0;
      memcpy(&v, p, pr.size);
      return (double)v;
    }
    default: {
      int64_t v = 0;
      // sign-extend
      memcpy(&v, p, pr.size);
      int shift = 64 - 8 * pr.size;
      v = (v << shift) >> shift;
      return (double)v;
    }
  }
}

}  // namespace

extern "C" {

long ply_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  bool ok = parse_header(f, h);
  fclose(f);
  return ok ? h.n_verts : -1;
}

int ply_read(const char* path, long n, float* xyz, float* rgb, float* normal,
             int* has_rgb, int* has_normal) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  Header h;
  if (!parse_header(f, h) || h.n_verts != n || h.ascii) {
    fclose(f);
    return 2;  // ascii handled by the python fallback
  }
  long stride = 0;
  int ix = -1, iy = -1, iz = -1, ir = -1, ig = -1, ib = -1;
  int inx = -1, iny = -1, inz = -1;
  std::vector<long> offs(h.props.size());
  for (size_t i = 0; i < h.props.size(); i++) {
    offs[i] = stride;
    stride += h.props[i].size;
    const std::string& nm = h.props[i].name;
    if (nm == "x") ix = i;
    else if (nm == "y") iy = i;
    else if (nm == "z") iz = i;
    else if (nm == "red") ir = i;
    else if (nm == "green") ig = i;
    else if (nm == "blue") ib = i;
    else if (nm == "nx") inx = i;
    else if (nm == "ny") iny = i;
    else if (nm == "nz") inz = i;
  }
  if (ix < 0 || iy < 0 || iz < 0) {
    fclose(f);
    return 3;
  }
  *has_rgb = (ir >= 0 && ig >= 0 && ib >= 0);
  *has_normal = (inx >= 0 && iny >= 0 && inz >= 0);

  std::vector<unsigned char> data(stride * n);
  fseek(f, h.data_offset, SEEK_SET);
  size_t got = fread(data.data(), 1, data.size(), f);
  fclose(f);
  if (got != data.size()) return 4;
  bool be = h.binary_be;
  bool rgb_is_uchar = *has_rgb && h.props[ir].kind == 'u';

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (long i = 0; i < n; i++) {
    const unsigned char* row = data.data() + i * stride;
    xyz[3 * i + 0] = (float)read_val(row + offs[ix], h.props[ix], be);
    xyz[3 * i + 1] = (float)read_val(row + offs[iy], h.props[iy], be);
    xyz[3 * i + 2] = (float)read_val(row + offs[iz], h.props[iz], be);
    if (*has_rgb && rgb) {
      double r = read_val(row + offs[ir], h.props[ir], be);
      double g = read_val(row + offs[ig], h.props[ig], be);
      double b = read_val(row + offs[ib], h.props[ib], be);
      double scale = rgb_is_uchar ? (1.0 / 255.0) : 1.0;
      rgb[3 * i + 0] = (float)(r * scale);
      rgb[3 * i + 1] = (float)(g * scale);
      rgb[3 * i + 2] = (float)(b * scale);
    }
    if (*has_normal && normal) {
      normal[3 * i + 0] = (float)read_val(row + offs[inx], h.props[inx], be);
      normal[3 * i + 1] = (float)read_val(row + offs[iny], h.props[iny], be);
      normal[3 * i + 2] = (float)read_val(row + offs[inz], h.props[inz], be);
    }
  }
  return 0;
}

}  // extern "C"
