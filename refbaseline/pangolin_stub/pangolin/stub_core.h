// Minimal header-only Pangolin API stub for building the reference binaries
// HEADLESS (no GL headers / libraries on this host).  Purpose: produce the
// reference baseline required by VERDICT.md item 1 — the reference pipeline
// (src/sfm.cpp, src/calibration.cpp) is compiled UNMODIFIED; with
// --show-gui false none of the stubbed GUI code paths execute.  The only
// functionally live pieces are ManagedImage/TypedImage (real pixel storage,
// used by keypoints.h) and LoadImage (real JPEG decode via OpenCV).
//
// This file is original code written for the baseline harness; it implements
// just the API surface the reference translation units reference.
#pragma once

#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <map>
#include <memory>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// Global-namespace OpenGL shims (constants + no-op entry points)
// ---------------------------------------------------------------------------
using GLenum = unsigned int;
using GLbitfield = unsigned int;

enum : unsigned int {
  GL_DEPTH_TEST = 0x0B71,
  GL_BLEND = 0x0BE2,
  GL_COLOR_BUFFER_BIT = 0x4000,
  GL_DEPTH_BUFFER_BIT = 0x0100,
  GL_LUMINANCE = 0x1909,
  GL_LUMINANCE8 = 0x8040,
  GL_UNSIGNED_BYTE = 0x1401,
  GL_SRC_ALPHA = 0x0302,
  GL_ONE_MINUS_SRC_ALPHA = 0x0303,
  GL_POINTS = 0x0000,
  GL_LINES = 0x0001,
};

template <typename... A> inline void glEnable(const A&...) {}
template <typename... A> inline void glDisable(const A&...) {}
template <typename... A> inline void glClear(const A&...) {}
template <typename... A> inline void glClearColor(const A&...) {}
template <typename... A> inline void glBlendFunc(const A&...) {}
template <typename... A> inline void glLineWidth(const A&...) {}
template <typename... A> inline void glPointSize(const A&...) {}
template <typename... A> inline void glColor3f(const A&...) {}
template <typename... A> inline void glColor3ubv(const A&...) {}
template <typename... A> inline void glBegin(const A&...) {}
template <typename... A> inline void glEnd(const A&...) {}
template <typename... A> inline void glVertex3f(const A&...) {}
template <typename... A> inline void glPushMatrix(const A&...) {}
template <typename... A> inline void glPopMatrix(const A&...) {}
template <typename... A> inline void glMultMatrixd(const A&...) {}

namespace pangolin {

// ---------------------------------------------------------------------------
// Images (functionally real: keypoints.h reads pixels through this)
// ---------------------------------------------------------------------------
template <typename T>
struct Image {
  size_t pitch = 0;  // bytes per row
  T* ptr = nullptr;
  size_t w = 0;
  size_t h = 0;

  T* RowPtr(size_t y) {
    return reinterpret_cast<T*>(reinterpret_cast<unsigned char*>(ptr) +
                                y * pitch);
  }
  const T* RowPtr(size_t y) const {
    return reinterpret_cast<const T*>(
        reinterpret_cast<const unsigned char*>(ptr) + y * pitch);
  }
  T& operator()(size_t x, size_t y) { return RowPtr(y)[x]; }
  const T& operator()(size_t x, size_t y) const { return RowPtr(y)[x]; }

  template <typename TX, typename TY, typename TB>
  bool InBounds(TX x, TY y, TB border) const {
    return x >= (TX)border && y >= (TY)border && x < (TX)(w - (size_t)border) &&
           y < (TY)(h - (size_t)border);
  }
};

template <typename T>
struct ManagedImage : public Image<T> {
  ManagedImage() = default;
  ManagedImage(size_t width, size_t height) { Reinitialise(width, height); }
  ManagedImage(const ManagedImage&) = delete;
  ManagedImage& operator=(const ManagedImage&) = delete;
  ManagedImage(ManagedImage&& o) noexcept { *this = std::move(o); }
  ManagedImage& operator=(ManagedImage&& o) noexcept {
    Free();
    this->ptr = o.ptr;
    this->w = o.w;
    this->h = o.h;
    this->pitch = o.pitch;
    o.ptr = nullptr;
    o.w = o.h = o.pitch = 0;
    return *this;
  }
  ~ManagedImage() { Free(); }

  void Reinitialise(size_t width, size_t height) {
    Free();
    this->w = width;
    this->h = height;
    this->pitch = width * sizeof(T);
    this->ptr = static_cast<T*>(std::malloc(this->pitch * height));
  }
  void Free() {
    if (this->ptr) std::free(this->ptr);
    this->ptr = nullptr;
  }
};

// The reference only move-assigns LoadImage's result into
// ManagedImage<uint8_t>; the images are 8-bit grayscale JPEGs.
using TypedImage = ManagedImage<unsigned char>;

// Implemented in pangolin_stub.cpp via OpenCV imgcodecs (grayscale decode).
TypedImage LoadImage(const std::string& filename);

// ---------------------------------------------------------------------------
// GUI machinery (compile-only; never executed with --show-gui false)
// ---------------------------------------------------------------------------
struct VarMeta {
  double range[2] = {0.0, 0.0};
  bool gui_changed = false;
};

template <typename T>
class Var {
 public:
  Var(const std::string&, const T& def) : v_(def) {}
  Var(const std::string&, const T& def, bool) : v_(def) {}
  Var(const std::string&, const T& def, double lo, double hi) : v_(def) {
    meta_.range[0] = lo;
    meta_.range[1] = hi;
  }
  // (name, default, min, max, logscale)
  Var(const std::string&, const T& def, double lo, double hi, bool)
      : v_(def) {
    meta_.range[0] = lo;
    meta_.range[1] = hi;
  }
  operator const T&() const { return v_; }
  const T& Get() const { return v_; }
  Var& operator=(const T& x) {
    v_ = x;
    return *this;
  }
  bool GuiChanged() {
    bool c = meta_.gui_changed;
    meta_.gui_changed = false;
    return c;
  }
  VarMeta& Meta() { return meta_; }

 private:
  T v_;
  VarMeta meta_;
};

struct Attach {
  double v = 0;
  Attach() = default;
  Attach(double x) : v(x) {}
  static Attach Pix(int p) { return Attach((double)p); }
};

enum Layout { LayoutEqual = 0, LayoutEqualVertical = 1 };
enum AxisDirection { AxisNegY = 0, AxisY, AxisNegZ, AxisZ, AxisNone };

struct OpenGlMatrix {};
inline OpenGlMatrix ProjectionMatrix(int, int, double, double, double, double,
                                     double, double) {
  return {};
}
inline OpenGlMatrix ModelViewLookAt(double, double, double, double, double,
                                    double, AxisDirection) {
  return {};
}

struct OpenGlRenderState {
  OpenGlRenderState() = default;
  OpenGlRenderState(const OpenGlMatrix&, const OpenGlMatrix&) {}
};

struct Handler {
  virtual ~Handler() = default;
};
struct Handler3D : public Handler {
  explicit Handler3D(OpenGlRenderState&) {}
};

class View {
 public:
  virtual ~View() = default;
  View& SetBounds(double, double, double, double) { return *this; }
  View& SetBounds(double, double, Attach, double) { return *this; }
  View& SetBounds(double, double, double, Attach) { return *this; }
  View& SetBounds(double, double, Attach, Attach) { return *this; }
  View& SetLayout(Layout) { return *this; }
  View& SetAspect(double) { return *this; }
  View& SetHandler(Handler*) { return *this; }
  View& AddDisplay(View&) { return *this; }
  void Activate() {}
  void Activate(OpenGlRenderState&) {}
  void Show(bool) {}
  std::function<void(View&)> extern_draw_function;
};

struct GlPixFormat {
  unsigned int glformat = 0;
  unsigned int gltype = 0;
  unsigned int scalable_internal_format = 0;
};

class ImageView : public View {
 public:
  template <typename... A>
  void SetImage(const A&...) {}
  void Clear() {}
};

inline View& Display(const std::string& name) {
  static std::map<std::string, std::unique_ptr<View>> views;
  auto& v = views[name];
  if (!v) v.reset(new View());
  return *v;
}
inline View& CreatePanel(const std::string& name) {
  return Display("panel_" + name);
}
inline View& CreateDisplay() {
  static int n = 0;
  return Display("anon_" + std::to_string(n++));
}
inline void CreateWindowAndBind(const std::string&, int, int) {}
inline bool ShouldQuit() { return true; }
inline void FinishFrame() {}

struct GlText {
  void Draw(double, double) const {}
  template <typename... A>
  void Draw(const A&...) const {}
};

struct GlFont {
  static GlFont& I() {
    static GlFont f;
    return f;
  }
  GlText Text(const char*, ...) const { return {}; }
  GlText Text(const std::string&) const { return {}; }
};

// drawing helpers (no-ops; templates absorb Eigen/scalar overloads)
template <typename... A> inline void glDrawLine(const A&...) {}
template <typename... A> inline void glDrawLineStrip(const A&...) {}
template <typename... A> inline void glDrawCirclePerimeter(const A&...) {}
template <typename... A> inline void glVertex(const A&...) {}

}  // namespace pangolin
