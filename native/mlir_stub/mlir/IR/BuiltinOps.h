// Stub header: lets xla/pjrt headers compile without LLVM/MLIR includes.
//
// The TensorFlow wheel ships mlir/ headers but NOT the llvm/ core headers
// they depend on (llvm/Support/Casting.h etc.), so the real
// mlir/IR/BuiltinOps.h is uncompilable here.  The only thing the PJRT
// headers (xla/pjrt/pjrt_client.h, pjrt_compiler.h) do with MLIR is pass
// `mlir::ModuleOp` BY VALUE through virtual default-implementations we
// never call.  The real ModuleOp is a trivially-copyable single-pointer
// wrapper around Operation*; this stand-in has identical name mangling
// (mangles by name, not definition) and identical register-passing ABI
// (one pointer, trivially copyable), so vtable layouts and signatures
// match.  Never call any MLIR-taking overload through this stub.
#ifndef MLIR_IR_BUILTINOPS_H
#define MLIR_IR_BUILTINOPS_H
namespace mlir {
class Operation;
class ModuleOp {
 public:
  ModuleOp() = default;

 private:
  Operation* state_ = nullptr;
};
}  // namespace mlir
#endif  // MLIR_IR_BUILTINOPS_H
