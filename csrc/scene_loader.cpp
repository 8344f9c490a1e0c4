// Fast OBJ parser with a C ABI for ctypes (see scene/native.py).
//
// Native-runtime counterpart of the reference's host-side scene ingest
// (MTPC/sceneManagement.cpp:76-189), redesigned:
//   * index buffers instead of denormalized per-face vertex copies;
//   * standard v/vt/vn corner order (the reference reads v/vn/vt, quirk #13);
//   * fan triangulation for polygons;
//   * single pass, no per-token std::string allocations.
//
// Output is copied into NumPy-owned buffers by the Python side; this keeps the
// ABI to four plain C functions and no Python.h dependency.

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ParseResult {
  std::vector<double> v;    // 3 * nv
  std::vector<double> vn;   // 3 * nvn
  std::vector<double> vt;   // 2 * nvt
  std::vector<long> f_v;    // 3 * nf (0-based, standard order)
  std::vector<long> f_vt;   // 3 * nf (-1 when absent)
  std::vector<long> f_vn;   // 3 * nf (-1 when absent)
  std::vector<long> f_slot; // nf, index into usemtl appearance order
  std::string material_names; // '\n'-joined usemtl names in appearance order
  long n_materials = 0;
};

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
  return p;
}

inline double read_double(const char*& p) {
  char* end = nullptr;
  double x = std::strtod(p, &end);
  p = end;
  return x;
}

struct Corner { long v, t, n; };

// "v", "v/t", "v//n", "v/t/n" with OBJ 1-based and negative-relative indices.
inline bool read_corner(const char*& p, long nv, long nvt, long nvn, Corner& c) {
  p = skip_ws(p);
  if (!std::isdigit((unsigned char)*p) && *p != '-') return false;
  char* end = nullptr;
  long vi = std::strtol(p, &end, 10);
  p = end;
  long ti = 0, ni = 0;
  if (*p == '/') {
    ++p;
    if (*p != '/') { ti = std::strtol(p, &end, 10); p = end; }
    if (*p == '/') { ++p; ni = std::strtol(p, &end, 10); p = end; }
  }
  c.v = vi > 0 ? vi - 1 : nv + vi;
  c.t = ti > 0 ? ti - 1 : (ti < 0 ? nvt + ti : -1);
  c.n = ni > 0 ? ni - 1 : (ni < 0 ? nvn + ni : -1);
  return true;
}

}  // namespace

extern "C" {

void* mcpt_parse_obj(const char* path) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return nullptr;
  std::fseek(fp, 0, SEEK_END);
  long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), fp) != (size_t)size) {
    std::fclose(fp);
    return nullptr;
  }
  std::fclose(fp);

  auto* r = new ParseResult();
  long cur_slot = -1;
  std::vector<Corner> corners;
  corners.reserve(8);

  const char* p = buf.c_str();
  const char* end = p + buf.size();
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p);
    if (q[0] == 'v' && q[1] == ' ') {
      q += 2;
      r->v.push_back(read_double(q));
      r->v.push_back(read_double(q));
      r->v.push_back(read_double(q));
    } else if (q[0] == 'v' && q[1] == 'n' && q[2] == ' ') {
      q += 3;
      r->vn.push_back(read_double(q));
      r->vn.push_back(read_double(q));
      r->vn.push_back(read_double(q));
    } else if (q[0] == 'v' && q[1] == 't' && q[2] == ' ') {
      q += 3;
      r->vt.push_back(read_double(q));
      r->vt.push_back(read_double(q));
    } else if (q[0] == 'f' && q[1] == ' ') {
      q += 2;
      corners.clear();
      Corner c;
      long nv = (long)r->v.size() / 3, nvt = (long)r->vt.size() / 2,
           nvn = (long)r->vn.size() / 3;
      while (q < line_end && read_corner(q, nv, nvt, nvn, c)) {
        corners.push_back(c);
        q = skip_ws(q);
      }
      long slot = cur_slot < 0 ? 0 : cur_slot;
      for (size_t k = 1; k + 1 < corners.size(); ++k) {  // fan
        const Corner tri[3] = {corners[0], corners[k], corners[k + 1]};
        for (int j = 0; j < 3; ++j) {
          r->f_v.push_back(tri[j].v);
          r->f_vt.push_back(tri[j].t);
          r->f_vn.push_back(tri[j].n);
        }
        r->f_slot.push_back(slot);
      }
    } else if (std::strncmp(q, "usemtl", 6) == 0) {
      q = skip_ws(q + 6);
      const char* name_end = line_end;
      while (name_end > q &&
             (name_end[-1] == ' ' || name_end[-1] == '\r' || name_end[-1] == '\t'))
        --name_end;
      if (!r->material_names.empty()) r->material_names.push_back('\n');
      r->material_names.append(q, name_end);
      cur_slot = r->n_materials++;
    }
    p = line_end + 1;
  }
  if (r->n_materials == 0) {
    r->n_materials = 1;  // single implicit slot
  }
  return r;
}

void mcpt_result_counts(void* handle, long* out5) {
  auto* r = static_cast<ParseResult*>(handle);
  out5[0] = (long)r->v.size() / 3;
  out5[1] = (long)r->vn.size() / 3;
  out5[2] = (long)r->vt.size() / 2;
  out5[3] = (long)r->f_slot.size();
  out5[4] = r->n_materials;
}

void mcpt_result_copy(void* handle, double* v, double* vn, double* vt,
                      long* f_v, long* f_vt, long* f_vn, long* f_slot) {
  auto* r = static_cast<ParseResult*>(handle);
  if (!r->v.empty()) std::memcpy(v, r->v.data(), r->v.size() * sizeof(double));
  if (!r->vn.empty()) std::memcpy(vn, r->vn.data(), r->vn.size() * sizeof(double));
  if (!r->vt.empty()) std::memcpy(vt, r->vt.data(), r->vt.size() * sizeof(double));
  if (!r->f_v.empty()) std::memcpy(f_v, r->f_v.data(), r->f_v.size() * sizeof(long));
  if (!r->f_vt.empty()) std::memcpy(f_vt, r->f_vt.data(), r->f_vt.size() * sizeof(long));
  if (!r->f_vn.empty()) std::memcpy(f_vn, r->f_vn.data(), r->f_vn.size() * sizeof(long));
  if (!r->f_slot.empty())
    std::memcpy(f_slot, r->f_slot.data(), r->f_slot.size() * sizeof(long));
}

const char* mcpt_result_material_names(void* handle) {
  return static_cast<ParseResult*>(handle)->material_names.c_str();
}

void mcpt_result_free(void* handle) { delete static_cast<ParseResult*>(handle); }

}  // extern "C"
