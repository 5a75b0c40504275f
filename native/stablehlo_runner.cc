// Native StableHLO executor: compile + run exported modules through the
// XLA PJRT CPU client, with no Python or JAX in the execution path.
//
// This is the rebuild's native serving runtime (SURVEY.md §2.1 SavedModel
// export / L7 serving: the reference served TF SavedModels through
// TensorFlow's C++ runtime; our exported artifact carries a StableHLO
// module, and this file is the C++ runtime that executes it).  The .so is
// driven through ctypes (core/native_runtime.py) by serving.py and tests,
// and by design could back any C/C++ server front-end.
//
// Build notes (core/native_runtime.py holds the build command):
//  - Links against the TensorFlow wheel's libtensorflow_cc.so.2, which
//    exports the XLA CPU PJRT client (xla::GetXlaPjrtCpuClient), the
//    StableHLO->XlaComputation bridge, and the PJRT C++ ABI.
//  - MUST be compiled with -DNDEBUG: the library is an NDEBUG build, and
//    tsl::AsyncValue payload extraction (Future::Await) relies on
//    type-id DCHECKs being compiled out — a debug build of this file
//    check-fails on XLA's by-design AsyncValue type reinterpretation.
//  - mlir_to_hlo.h is uncompilable here (the wheel ships no llvm/
//    headers); the one function we need is forward-declared below and
//    mlir::ModuleOp is satisfied by native/mlir_stub (see its comment).
//
// Threading: one handle == one loaded executable; calls on a given handle
// must be serialized by the caller (serving.py dispatches single-threaded
// by design — CLAUDE.md environment rules).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

#include "xla/hlo/builder/xla_computation.h"
#include "xla/pjrt/pjrt_client.h"

namespace xla {
// From xla/pjrt/mlir_to_hlo.h (unincludable: needs LLVM headers the wheel
// does not ship).  absl::string_view == std::string_view in this build, so
// the mangled name matches libtensorflow_cc's export.
absl::Status ParseMlirModuleStringAndConvertToXlaComputation(
    absl::string_view mlir_module_str, XlaComputation& xla_computation,
    bool use_tuple_args, bool return_tuple);
}  // namespace xla

#include "xla/pjrt/plugin/xla_cpu/cpu_client_options.h"
#include "xla/pjrt/plugin/xla_cpu/xla_cpu_pjrt_client.h"

namespace {

// dtype codes shared with core/native_runtime.py
constexpr int32_t kF32 = 0, kS32 = 1, kU8 = 2, kBF16 = 3, kS8 = 4,
                  kS64 = 5, kPred = 6, kF64 = 7;

xla::PrimitiveType ToPrimitive(int32_t code) {
  switch (code) {
    case kF32: return xla::PrimitiveType::F32;
    case kS32: return xla::PrimitiveType::S32;
    case kU8: return xla::PrimitiveType::U8;
    case kBF16: return xla::PrimitiveType::BF16;
    case kS8: return xla::PrimitiveType::S8;
    case kS64: return xla::PrimitiveType::S64;
    case kPred: return xla::PrimitiveType::PRED;
    case kF64: return xla::PrimitiveType::F64;
    default: return xla::PrimitiveType::PRIMITIVE_TYPE_INVALID;
  }
}

xla::PjRtClient* GetClient(std::string* error) {
  static std::once_flag once;
  static std::unique_ptr<xla::PjRtClient> client;
  static std::string init_error;
  std::call_once(once, [] {
    xla::CpuClientOptions opts;
    opts.cpu_device_count = 1;
    auto client_or = xla::GetXlaPjrtCpuClient(std::move(opts));
    if (client_or.ok()) {
      client = std::move(client_or).value();
    } else {
      init_error = client_or.status().ToString();
    }
  });
  if (!client && error) *error = init_error;
  return client.get();
}

struct Handle {
  std::unique_ptr<xla::PjRtLoadedExecutable> executable;
  // Weights uploaded once by shr_preload; they form the leading arguments
  // of every execution (the exported calling convention keeps params and
  // batch_stats first — re-uploading ~GBs per request would swamp the
  // step, same reason the JAX paths keep weights device-resident).
  std::vector<std::unique_ptr<xla::PjRtBuffer>> preloaded;
  std::string last_error;
};

void SetErr(char* err, int64_t cap, const std::string& msg) {
  if (err && cap > 0) {
    snprintf(err, static_cast<size_t>(cap), "%s", msg.c_str());
  }
}

// Upload one host array.  kImmutableOnlyDuringCall → PJRT copies
// synchronously; the caller's buffer can be reused immediately after.
absl::StatusOr<std::unique_ptr<xla::PjRtBuffer>> Upload(
    xla::PjRtClient* client, const void* data, int32_t dtype,
    const int64_t* dims, int32_t ndims) {
  xla::PrimitiveType type = ToPrimitive(dtype);
  if (type == xla::PrimitiveType::PRIMITIVE_TYPE_INVALID) {
    return absl::InvalidArgumentError("unknown dtype code");
  }
  auto* mem =
      client->addressable_devices()[0]->default_memory_space().value();
  return client->BufferFromHostBuffer(
      data, type, absl::Span<int64_t const>(dims, ndims),
      /*byte_strides=*/std::nullopt,
      xla::PjRtClient::HostBufferSemantics::kImmutableOnlyDuringCall,
      /*on_done_with_host_buffer=*/nullptr, mem, /*device_layout=*/nullptr);
}

}  // namespace

extern "C" {

// Compile a StableHLO module (text or bytecode both parse) → handle.
// Returns nullptr on failure with `err` filled.
void* shr_compile(const char* mlir_data, int64_t mlir_len, char* err,
                  int64_t err_cap) {
  std::string cerr;
  xla::PjRtClient* client = GetClient(&cerr);
  if (!client) {
    SetErr(err, err_cap, "PJRT CPU client init failed: " + cerr);
    return nullptr;
  }
  xla::XlaComputation computation;
  auto st = xla::ParseMlirModuleStringAndConvertToXlaComputation(
      absl::string_view(mlir_data, static_cast<size_t>(mlir_len)),
      computation, /*use_tuple_args=*/false, /*return_tuple=*/false);
  if (!st.ok()) {
    SetErr(err, err_cap, "StableHLO parse failed: " + st.ToString());
    return nullptr;
  }
  auto exe_or = client->CompileAndLoad(computation, xla::CompileOptions());
  if (!exe_or.ok()) {
    SetErr(err, err_cap,
           "XLA compile failed: " + exe_or.status().ToString());
    return nullptr;
  }
  auto* h = new Handle();
  h->executable = std::move(exe_or).value();
  return h;
}

// Upload `nargs` arrays once and pin them as the leading execution
// arguments (the exported module's weight leaves).  Replaces any prior
// preload.  Arrays are packed as: arg_data[i] points at array i's bytes,
// arg_ndims[i] its rank, and arg_dims holds all ranks' dims concatenated.
int32_t shr_preload(void* handle, int32_t nargs, const void** arg_data,
                    const int32_t* arg_dtypes, const int64_t* arg_dims,
                    const int32_t* arg_ndims, char* err, int64_t err_cap) {
  auto* h = static_cast<Handle*>(handle);
  std::string cerr;
  xla::PjRtClient* client = GetClient(&cerr);
  if (!client) {
    SetErr(err, err_cap, cerr);
    return -1;
  }
  std::vector<std::unique_ptr<xla::PjRtBuffer>> bufs;
  const int64_t* dims = arg_dims;
  for (int32_t i = 0; i < nargs; ++i) {
    auto buf_or =
        Upload(client, arg_data[i], arg_dtypes[i], dims, arg_ndims[i]);
    if (!buf_or.ok()) {
      SetErr(err, err_cap,
             "preload arg " + std::to_string(i) + ": " +
                 buf_or.status().ToString());
      return -1;
    }
    bufs.push_back(std::move(buf_or).value());
    dims += arg_ndims[i];
  }
  h->preloaded = std::move(bufs);
  return 0;
}

// Execute: arguments are (preloaded weights) + the `nargs` per-call arrays
// given here, in order.  Each output i is copied raw into out_data[i]
// (caller-allocated, out_bytes[i] bytes, dense row-major).
int32_t shr_execute(void* handle, int32_t nargs, const void** arg_data,
                    const int32_t* arg_dtypes, const int64_t* arg_dims,
                    const int32_t* arg_ndims, int32_t nouts, void** out_data,
                    const int64_t* out_bytes, char* err, int64_t err_cap) {
  auto* h = static_cast<Handle*>(handle);
  std::string cerr;
  xla::PjRtClient* client = GetClient(&cerr);
  if (!client) {
    SetErr(err, err_cap, cerr);
    return -1;
  }
  std::vector<std::unique_ptr<xla::PjRtBuffer>> call_bufs;
  const int64_t* dims = arg_dims;
  for (int32_t i = 0; i < nargs; ++i) {
    auto buf_or =
        Upload(client, arg_data[i], arg_dtypes[i], dims, arg_ndims[i]);
    if (!buf_or.ok()) {
      SetErr(err, err_cap,
             "arg " + std::to_string(i) + ": " + buf_or.status().ToString());
      return -1;
    }
    call_bufs.push_back(std::move(buf_or).value());
    dims += arg_ndims[i];
  }

  std::vector<xla::PjRtBuffer*> args;
  args.reserve(h->preloaded.size() + call_bufs.size());
  for (auto& b : h->preloaded) args.push_back(b.get());
  for (auto& b : call_bufs) args.push_back(b.get());
  std::vector<std::vector<xla::PjRtBuffer*>> all_args = {std::move(args)};

  auto out_or = h->executable->Execute(absl::MakeSpan(all_args),
                                       xla::ExecuteOptions());
  if (!out_or.ok()) {
    SetErr(err, err_cap, "execute: " + out_or.status().ToString());
    return -1;
  }
  auto& outs = out_or.value()[0];
  if (static_cast<int32_t>(outs.size()) != nouts) {
    SetErr(err, err_cap,
           "output arity mismatch: module returns " +
               std::to_string(outs.size()) + ", caller expected " +
               std::to_string(nouts));
    return -1;
  }
  for (int32_t i = 0; i < nouts; ++i) {
    auto st = outs[i]->CopyRawToHost(out_data[i], 0, out_bytes[i]).Await();
    if (!st.ok()) {
      SetErr(err, err_cap,
             "output " + std::to_string(i) + ": " + st.ToString());
      return -1;
    }
  }
  return 0;
}

void shr_destroy(void* handle) { delete static_cast<Handle*>(handle); }

// Build/ABI self-check: compiles and runs a tiny embedded module so the
// Python side can verify the runtime end-to-end without an export.
int32_t shr_selftest(char* err, int64_t err_cap) {
  static const char kModule[] = R"mlir(
module @selftest {
  func.func public @main(%arg0: tensor<4xf32>, %arg1: tensor<4xf32>) -> tensor<4xf32> {
    %0 = stablehlo.add %arg0, %arg1 : tensor<4xf32>
    func.return %0 : tensor<4xf32>
  }
}
)mlir";
  void* h = shr_compile(kModule, sizeof(kModule) - 1, err, err_cap);
  if (!h) return -1;
  float a[4] = {1, 2, 3, 4}, b[4] = {10, 20, 30, 40}, r[4] = {0, 0, 0, 0};
  const void* args[2] = {a, b};
  int32_t dtypes[2] = {kF32, kF32};
  int64_t adims[2] = {4, 4};
  int32_t ndims[2] = {1, 1};
  void* outs[1] = {r};
  int64_t obytes[1] = {sizeof(r)};
  int32_t rc = shr_execute(h, 2, args, dtypes, adims, ndims, 1, outs, obytes,
                           err, err_cap);
  shr_destroy(h);
  if (rc != 0) return -1;
  for (int i = 0; i < 4; ++i) {
    if (r[i] != a[i] + b[i]) {
      SetErr(err, err_cap, "selftest value mismatch");
      return -1;
    }
  }
  return 0;
}

}  // extern "C"
