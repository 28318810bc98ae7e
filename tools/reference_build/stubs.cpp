// Headless-link stubs: the -f (write_to_file) code path never creates a
// window, touches GL, or opens the visual debugger; these satisfy the
// linker for symbols referenced by compiled-but-unreached viewer code.
#include <cstddef>
#include <string>

#include "CGL/viewer.h"
#include "CGL/osdtext.h"
#include "application/visual_debugger.h"

namespace CGL {

// ---- Viewer (viewer.cpp replaced) ----
bool Viewer::HDPI = false;
int Viewer::framecount = 0;
std::chrono::time_point<std::chrono::system_clock> Viewer::sys_last;
std::chrono::time_point<std::chrono::system_clock> Viewer::sys_curr;
bool Viewer::showInfo = false;
GLFWwindow* Viewer::window = nullptr;
size_t Viewer::buffer_w = 0;
size_t Viewer::buffer_h = 0;
Renderer* Viewer::renderer = nullptr;
OSDText* Viewer::osd_text = nullptr;
int Viewer::line_id_renderer = 0;
int Viewer::line_id_framerate = 0;

Viewer::Viewer(void) {}
Viewer::~Viewer(void) {}
void Viewer::init(void) {}
void Viewer::start(void) {}
void Viewer::set_renderer(Renderer* r) { renderer = r; }
void Viewer::resize_callback(GLFWwindow*, int, int) {}

// ---- OSDText (osdtext.cpp replaced) ----
OSDText::OSDText() {}
OSDText::~OSDText() {}
int OSDText::init(bool) { return 0; }
void OSDText::render() {}
void OSDText::resize(size_t, size_t) {}
int OSDText::add_line(float, float, std::string, size_t, Color) { return 0; }
void OSDText::clear() {}

// ---- VisualDebugger (compiled out in the reference itself) ----
VisualDebugger::VisualDebugger(GLScene::Scene** s, int* m)
    : window(nullptr), window_parent(nullptr), parent_scene(s), current_mode(m) {}
VisualDebugger::~VisualDebugger() {}
void VisualDebugger::render() {}

bool DragDouble(const char*, const double*, float) { return false; }
bool DragDouble3(const char*, const double*, float) { return false; }

}  // namespace CGL

namespace ImGui {
bool TreeNode(const char*) { return false; }
bool TreeNode(const void*, const char*, ...) { return false; }
void TreePop() {}
}  // namespace ImGui

// ---- GL / GLU / GLFW no-ops (never called on the -f path) ----
extern "C" {
void glBegin(unsigned) {}
void glColor3fv(const float*) {}
void glColor4f(float, float, float, float) {}
void glColor4fv(const float*) {}
void glDepthMask(unsigned char) {}
void glDisable(unsigned) {}
void glDrawPixels(int, int, unsigned, unsigned, const void*) {}
void glEnable(unsigned) {}
void glEnd() {}
void glGetDoublev(unsigned, double*) {}
void glGetIntegerv(unsigned, int*) {}
void glHint(unsigned, unsigned) {}
unsigned char glIsEnabled(unsigned) { return 0; }
void glLineWidth(float) {}
void glLoadIdentity() {}
void glMatrixMode(unsigned) {}
void glNormal3dv(const double*) {}
void glOrtho(double, double, double, double, double, double) {}
void glPointSize(float) {}
void glPolygonOffset(float, float) {}
void glPopAttrib() {}
void glPopMatrix() {}
void glPushAttrib(unsigned) {}
void glPushMatrix() {}
void glScaled(double, double, double) {}
void glTranslated(double, double, double) {}
void glTranslatef(float, float, float) {}
void glVertex2f(float, float) {}
void glVertex3d(double, double, double) {}
void glVertex3dv(const double*) {}
void glVertex3f(float, float, float) {}
void glVertex3i(int, int, int) {}
void glViewport(int, int, int, int) {}
void glfwSetWindowSize(GLFWwindow*, int, int) {}
void gluLookAt(double, double, double, double, double, double, double, double, double) {}
void gluPerspective(double, double, double, double) {}
}
